"""Run the trainer tests in a FRESH subprocess.

The trainer module (tests/test_trainer_impl.py — the real tests) is
green standalone but crashes the interpreter when it runs AFTER the
~130 other suite tests that load torch (the reference-parity suites):
the pmap train-step compile died in three DIFFERENT places across
full-suite runs — jax's persistent-cache read (round 4,
``get_executable_and_time``), the cache write (round 5,
``put_executable_and_time``), and finally ``backend_compile_and_load``
itself with the persistent cache fully disabled via
``jax_enable_compilation_cache=False`` + ``reset_cache()``. A crash
that survives removal of the component it first appeared in is not a
cache bug: it is in-process state corruption from the torch+jax
coexistence (128 GB free when it dies, so not OOM), and the
conventional handling for that is PROCESS ISOLATION.

This wrapper runs the module under a fresh interpreter where it has
always passed (no torch loaded, persistent cache enabled and warm).
tests/conftest.py keeps ``test_trainer_impl.py`` out of top-level
collection unless NEURAY_TRAINER_SUBPROC is set, so the tests run
exactly once.
"""
import os
import subprocess
import sys


def test_trainer_module_in_subprocess():
    impl = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "test_trainer_impl.py")
    env = dict(os.environ, NEURAY_TRAINER_SUBPROC="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        env=env, capture_output=True, text=True, timeout=2400)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0, "trainer subprocess suite failed"
