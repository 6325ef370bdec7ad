"""Driver-entry and mesh tests: entry() compiles, dryrun_multichip runs on
the virtual 8-device CPU mesh, mesh helpers shard correctly."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from multivae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_batch,
)


class TestEntry:
    pytestmark = pytest.mark.driver  # driver-contract: entry + dryrun

    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out["joint_mu"].shape == (256, 20)
        assert out["rec_rois"].shape == (256, 444)
        assert np.isfinite(np.asarray(out["joint_divergence"]))

    def test_dryrun_multichip(self):
        # the driver's exact shape; each run is a full hermetic subprocess
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    @pytest.mark.slow
    @pytest.mark.parametrize("n", [2, 4])
    def test_dryrun_multichip_other_counts(self, n):
        import __graft_entry__ as ge
        ge.dryrun_multichip(n)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(n_model=2, n_data=4)
        assert mesh.shape == {"model": 2, "data": 4}

    def test_shard_batch_places_data(self):
        mesh = make_mesh(n_model=1, n_data=8)
        batch = {"x": jnp.ones((16, 4))}
        sharded = shard_batch(mesh, batch)
        assert sharded["x"].sharding == batch_sharding(mesh)

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(n_model=4, n_data=4)
