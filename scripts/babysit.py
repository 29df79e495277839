#!/usr/bin/env python3
"""Babysit a long TPU job: restart it when its log stalls.

The remote TPU tunnel in this environment has repeatedly wedged processes
~50 minutes in (host blocked in a device fetch, device silent — see
docs/rd_full_video_wedge.log). Every long-running phase in this framework
is resumable across restarts (prior EM via io/train_state, encode via
io/encode_state), so the safe recovery is: kill the exact PID, wait out
the ~10-minute device-grant wedge a killed client causes (CLAUDE.md), and
relaunch the same command, which resumes from its snapshots.

    python scripts/babysit.py --log run.log --stall 360 -- \
        python -m recombiner_tpu.cli.rd_sweep ... --train_state_dir st --state_dir st

Only ever kills the child it spawned (never pattern-matching).
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help="child stdout/stderr (append); its mtime is the liveness signal")
    p.add_argument("--stall", type=float, default=360.0, help="seconds without log writes before declaring a wedge")
    p.add_argument("--cooldown", type=float, default=640.0, help="wait after killing a wedged child (device-grant recovery)")
    p.add_argument("--max_restarts", type=int, default=8)
    p.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command ...")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (use -- cmd ...)")

    for attempt in range(args.max_restarts + 1):
        with open(args.log, "ab", buffering=0) as logf:
            logf.write(f"\n=== babysit attempt {attempt} ===\n".encode())
            # new session: the stall kill must take out the WHOLE process
            # group — killing only a shell wrapper orphans the python
            # grandchild, which keeps holding the TPU grant while the next
            # attempt launches into it (observed 2026-08-17)
            child = subprocess.Popen(
                cmd, stdout=logf, stderr=logf, start_new_session=True
            )
        print(f"[babysit] attempt {attempt}: pid {child.pid}", flush=True)

        def kill_tree(sig):
            try:
                os.killpg(child.pid, sig)
            except ProcessLookupError:
                pass

        wedged = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            age = time.time() - os.path.getmtime(args.log)
            if age > args.stall:
                print(f"[babysit] log stalled {age:.0f}s; killing {child.pid}", flush=True)
                kill_tree(signal.SIGTERM)
                try:
                    child.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    kill_tree(signal.SIGKILL)
                    child.wait()
                wedged = True
                break
            time.sleep(15)
        if not wedged:
            if child.returncode == 0:
                print("[babysit] child finished OK", flush=True)
                return 0
            # a nonzero exit is usually the TPU worker crashing, which
            # wedges the device grant just like a killed client (~10 min,
            # CLAUDE.md) — relaunching after 30 s lands inside the wedge and
            # burns a restart; cool down the full grant-recovery window
            print(
                f"[babysit] child exited rc={child.returncode}; "
                f"cooling down {args.cooldown:.0f}s before relaunch", flush=True)
            time.sleep(args.cooldown)
        else:
            print(f"[babysit] cooling down {args.cooldown:.0f}s (device grant)", flush=True)
            time.sleep(args.cooldown)
    print("[babysit] giving up", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
