"""The persistent compile cache must engage for library callers (importing
``multivae_tpu.workflows``) and for the CLI, and must never clobber a cache
dir the process configured first (the suite's conftest pins its own)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.driver  # compile-cache contract (subprocess)


@pytest.mark.slow
def test_compile_cache_configuration():
    """Three isolated interpreters, launched concurrently (each pays a
    full jax import, so serial execution would triple the wall clock):
    default dir on plain import, env-var override, and no clobbering of a
    pre-configured cache dir."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    # an ambient override would defeat the default-dir case
    env.pop("MULTIVAE_COMPILATION_CACHE_DIR", None)
    cases = [
        # (extra env, code, expected stdout predicate)
        ({}, "import multivae_tpu.workflows, jax;"
             "print(jax.config.jax_compilation_cache_dir)",
         lambda out: out.endswith(
             os.path.join(".cache", "multivae_tpu_jax"))),
        ({"MULTIVAE_COMPILATION_CACHE_DIR": "/tmp/mvae_cc"},
         "import multivae_tpu.workflows, jax;"
         "print(jax.config.jax_compilation_cache_dir)",
         lambda out: out == "/tmp/mvae_cc"),
        ({}, "import jax;"
             "jax.config.update('jax_compilation_cache_dir', '/tmp/pre');"
             "import multivae_tpu.workflows;"
             "print(jax.config.jax_compilation_cache_dir)",
         lambda out: out == "/tmp/pre"),
    ]
    procs = [subprocess.Popen([sys.executable, "-c", code],
                              env={**env, **extra},
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for extra, code, _ in cases]
    for proc, (_, _, check) in zip(procs, cases):
        out, err = proc.communicate(timeout=180)
        assert proc.returncode == 0, err
        assert check(out.strip()), out
