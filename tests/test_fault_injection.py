"""Crash-resume fault injection (SURVEY §5 failure detection/recovery).

Two layers:

* unit: ``checkpoint._atomic_write`` can die at any instant without
  tearing the target file, and ``save_checkpoint`` orders ``opt_state``
  before ``model`` so a checkpoint dir is discovered only once the pair
  is complete;
* driver: a real training subprocess is SIGKILLed in the middle of a
  checkpoint write (tmp half-written, replace never reached — the exact
  torn-file instant), and ``resume`` from the surviving checkpoint
  reconverges BIT-FOR-BIT to an uninterrupted run's final params under
  ``save_optimizer=all`` — the guarantee the epoch-keyed rng streams
  (``fold_in(base, epoch)`` in every driver) plus exact Adam-state
  restore provide. Reference restart surface: ``utils/BaseFlags.py:12,20``
  (``--start_epoch``/``--load_saved``, no optimizer recovery upstream).
"""

import os
import signal
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from multivae_tpu.train import checkpoint as ck

N_SCORES, N_ROIS = 4, 12
TRAIN_KW = ("dataset='synthetic', datasetdir={dd!r}, outdir={od!r}, "
            "input_dims=[4, 12], latent_dim=6, style_dim=[2, 3], "
            "num_epochs={ep}, batch_size=32, method='joint_elbo', "
            "learning_rate=0.003, use_tensorboard=False, log_every=10")


class TestAtomicWrites:
    def test_crash_before_replace_leaves_target_untouched(self, tmp_path,
                                                          monkeypatch):
        target = tmp_path / "model"
        target.write_bytes(b"previous-complete-checkpoint")

        def boom(src, dst):
            raise OSError("simulated crash at the replace instant")

        monkeypatch.setattr(os, "replace", boom)
        with pytest.raises(OSError, match="simulated"):
            ck._atomic_write(str(target), b"new-bytes")
        # the previous complete file survives; the partial write is
        # quarantined in the tmp file
        assert target.read_bytes() == b"previous-complete-checkpoint"
        assert (tmp_path / "model.tmp").read_bytes() == b"new-bytes"

    def test_save_checkpoint_writes_opt_state_before_model(self, tmp_path,
                                                           monkeypatch):
        order = []
        real = ck._atomic_write

        def spy(path, data):
            order.append(os.path.basename(path))
            real(path, data)

        monkeypatch.setattr(ck, "_atomic_write", spy)
        params = {"enc_clinical": {"w": np.ones((2, 2), np.float32)}}
        opt = {"count": np.int32(3)}
        ck.save_checkpoint(str(tmp_path / "0004"), params, opt)
        assert order == ["opt_state", "model"]
        # no tmp residue after a clean save
        assert sorted(os.listdir(tmp_path / "0004")) == ["model",
                                                         "opt_state"]

    def test_dir_without_model_is_invisible_to_discovery(self, tmp_path):
        """A crash between the opt_state and model writes leaves a dir
        find_checkpoint never selects."""
        params = {"w": np.ones((2,), np.float32)}
        ck.save_checkpoint(str(tmp_path / "0004"), params)
        os.makedirs(tmp_path / "0009")
        (tmp_path / "0009" / "opt_state").write_bytes(b"complete")
        (tmp_path / "0009" / "model.tmp").write_bytes(b"half-writ")
        path, epoch = ck.find_checkpoint(str(tmp_path))
        assert epoch == 4 and path.endswith(os.path.join("0004", "model"))


@pytest.mark.slow
@pytest.mark.driver
class TestSigkillResume:
    def _child_script(self, datasetdir, outdir, cache_dir):
        # mirrors tests/conftest.py's backend setup so the child's numerics
        # match the in-process reference run exactly
        return textwrap.dedent(f"""
            import os, signal
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
            jax.config.update("jax_compilation_cache_dir", {cache_dir!r})
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.1)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
            from multivae_tpu.train import checkpoint as ck

            real = ck._atomic_write
            def killing_write(path, data):
                if path.endswith(os.path.join("0019", "model")):
                    # die mid-write: tmp half-written, replace never runs
                    with open(path + ".tmp", "wb") as fh:
                        fh.write(data[: max(1, len(data) // 2)])
                    os.kill(os.getpid(), signal.SIGKILL)
                real(path, data)
            ck._atomic_write = killing_write

            from multivae_tpu import workflows as wf
            wf.train_exp({TRAIN_KW.format(dd=datasetdir, od=outdir, ep=20)})
        """)

    def test_sigkill_mid_checkpoint_write_resumes_bit_exact(
            self, tmp_path):
        from multivae_tpu.data import make_synthetic_cohort
        from multivae_tpu import workflows as wf

        datasetdir = str(tmp_path / "data")
        victim_out = str(tmp_path / "victim")
        ref_out = str(tmp_path / "ref")
        os.makedirs(victim_out)
        os.makedirs(ref_out)
        make_synthetic_cohort(datasetdir, n_subjects=120, n_scores=N_SCORES,
                              n_rois=N_ROIS, missing_rate=0.15, seed=5,
                              signal_strength=2.0)
        cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")

        # victim: killed by SIGKILL from inside the 0019/model write
        script = self._child_script(datasetdir, victim_out, cache_dir)
        proc = subprocess.run([sys.executable, "-c", script],
                              capture_output=True, text=True, timeout=420)
        assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
        runs = [d for d in os.listdir(victim_out)
                if os.path.isdir(os.path.join(victim_out, d))]
        assert len(runs) == 1
        run = runs[0]
        ckpts = os.path.join(victim_out, run, "checkpoints")
        # torn state: 0019 has opt_state + model.tmp but NO model, so
        # discovery resumes from the last complete pair (0014)
        assert os.path.exists(os.path.join(ckpts, "0019", "model.tmp"))
        assert not os.path.exists(os.path.join(ckpts, "0019", "model"))
        assert os.path.exists(os.path.join(ckpts, "0019", "opt_state"))
        path, epoch = ck.find_checkpoint(ckpts)
        assert epoch == 14
        for e in ("0004", "0009", "0014"):
            assert os.path.exists(os.path.join(ckpts, e, "opt_state"))

        # resume the victim to 30 epochs
        wf.resume_exp("synthetic", datasetdir, victim_out, run,
                      num_epochs=30, use_tensorboard=False, log_every=10)

        # uninterrupted reference run, same seed/config, 30 epochs
        ref_run = wf.train_exp(
            dataset="synthetic", datasetdir=datasetdir, outdir=ref_out,
            input_dims=[4, 12], latent_dim=6, style_dim=[2, 3],
            num_epochs=30, batch_size=32, method="joint_elbo",
            learning_rate=0.003, use_tensorboard=False, log_every=10)

        final_victim = os.path.join(ckpts, "0029", "model")
        final_ref = os.path.join(ref_out, ref_run, "checkpoints", "0029",
                                 "model")
        with open(final_victim, "rb") as fv, open(final_ref, "rb") as fr:
            assert fv.read() == fr.read(), \
                "resumed params diverged from the uninterrupted run"
        # and the Adam state reconverged too (save_optimizer=all default)
        with open(os.path.join(os.path.dirname(final_victim),
                               "opt_state"), "rb") as fv, \
                open(os.path.join(os.path.dirname(final_ref),
                                  "opt_state"), "rb") as fr:
            assert fv.read() == fr.read()
