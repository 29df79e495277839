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
    p.add_argument("--recycle", type=float, default=0.0,
                   help="proactively restart a HEALTHY child after this many "
                        "seconds. The tunnel wedges long-lived clients ~45-50 "
                        "min into their lifetime (observed 3x on 2026-08-21, "
                        "plus the round-2/3 history); recycling just before "
                        "that horizon trades the 25-min stall detection for "
                        "a planned kill+cooldown+resume (~18 min), raising "
                        "the duty cycle of multi-hour runs. 0 = off. "
                        "Recycles do not count against --max_restarts.")
    p.add_argument("cmd", nargs=argparse.REMAINDER, help="-- command ...")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (use -- cmd ...)")

    attempt = -1
    restarts = 0
    while restarts <= args.max_restarts:
        attempt += 1
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
        recycled = False
        t_start = time.time()
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
            if args.recycle and time.time() - t_start > args.recycle and age < 60:
                # healthy (log fresh) but nearing the tunnel's wedge horizon:
                # planned restart, resumes from its own snapshots
                print(f"[babysit] recycling healthy child {child.pid} after "
                      f"{time.time() - t_start:.0f}s", flush=True)
                kill_tree(signal.SIGTERM)
                try:
                    child.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    kill_tree(signal.SIGKILL)
                    child.wait()
                wedged = True
                recycled = True
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
            restarts += 1
        else:
            print(f"[babysit] cooling down {args.cooldown:.0f}s (device grant)", flush=True)
            time.sleep(args.cooldown)
            if not recycled:
                restarts += 1
    print("[babysit] giving up", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
