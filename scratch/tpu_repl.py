"""Persistent TPU attempt-runner (axon tunnel).

Holds the remote TPU in one process (first-touch costs ~4 min) and
executes /tmp/attempt.py whenever /tmp/trig appears, after reloading the
kernel modules — ~1-5 min per kernel-code iteration instead of a fresh
process each time.  Results (stdout + traceback) go to /tmp/attempt.out,
completion is signalled by /tmp/done.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scratch/tpu_repl.py &
    # per attempt:
    cp my_attempt.py /tmp/attempt.py && touch /tmp/trig
    # wait for /tmp/done, read /tmp/attempt.out
"""

import importlib
import io
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

print("backend:", jax.default_backend(), jax.devices(), flush=True)

TRIG, SRC, OUT, DONE = "/tmp/trig", "/tmp/attempt.py", "/tmp/attempt.out", \
    "/tmp/done"

KERNEL_MODS = ["qavit_tpu.kernels.fused_ref", "qavit_tpu.kernels.fused_cores",
               "qavit_tpu.kernels.fused_pallas",
               "qavit_tpu.kernels.fused_kernels",
               "qavit_tpu.kernels.fused_block"]


def run_once():
    for m in KERNEL_MODS:
        if m in sys.modules:
            importlib.reload(sys.modules[m])
    src = open(SRC).read()
    buf = io.StringIO()
    stdout = sys.stdout
    try:
        sys.stdout = buf
        ns = {"__name__": "__attempt__"}
        exec(compile(src, SRC, "exec"), ns)
        ok = True
    except Exception:
        buf.write(traceback.format_exc())
        ok = False
    finally:
        sys.stdout = stdout
    open(OUT, "w").write(buf.getvalue())
    open(DONE, "w").write("ok" if ok else "fail")
    print(f"attempt {'ok' if ok else 'FAIL'} ({len(buf.getvalue())}B)",
          flush=True)


print("repl ready; touch /tmp/trig to run /tmp/attempt.py", flush=True)
while True:
    if os.path.exists(TRIG):
        os.remove(TRIG)
        if os.path.exists(DONE):
            os.remove(DONE)
        run_once()
    time.sleep(2)
