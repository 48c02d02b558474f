#!/usr/bin/env python3
"""Run a command; kill it when its subtree's CPUTIME STALLS.

The remote-TPU tunnel flaps (CLAUDE.md): a process wedged on a dead
tunnel RPC sleeps forever in recv — `timeout` alone burns the full
budget (observed: a 90-min arm budget spent on a 20-min-old wedge).
CLAUDE.md's wedge heuristic is "cputime stops advancing"; this wrapper
automates it: poll the child subtree's total utime+stime from /proc and
kill the process group when it hasn't advanced for --stall-secs.

Usage:
  run_watchdogged.py [--stall-secs 600] [--timeout 5400] -- cmd args...

Exit codes: the child's; 124 on wall timeout; 125 on stall-kill.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time


def _stat_fields(pid: int):
    with open(f"/proc/{pid}/stat") as f:
        st = f.read()
    # comm (field 2) may contain spaces/parens; split after its ')'.
    return st[st.rindex(")") + 2:].split()


def _subtree(root: int) -> set:
    ppid_of = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            ppid_of[int(d)] = int(_stat_fields(int(d))[1])
        except (OSError, IndexError, ValueError):
            continue
    out = {root}
    grew = True
    while grew:
        grew = False
        for pid, ppid in ppid_of.items():
            if ppid in out and pid not in out:
                out.add(pid)
                grew = True
    return out


def _subtree_cputime(root: int) -> int:
    total = 0
    for pid in _subtree(root):
        try:
            f = _stat_fields(pid)
            total += int(f[11]) + int(f[12])      # utime + stime (ticks)
        except (OSError, IndexError, ValueError):
            continue
    return total


def main() -> int:
    args = sys.argv[1:]
    stall_secs, wall_timeout = 600.0, None
    while args and args[0].startswith("--"):
        if args[0] == "--":
            args = args[1:]
            break
        key, val = args[0], args[1]
        if key == "--stall-secs":
            stall_secs = float(val)
        elif key == "--timeout":
            wall_timeout = float(val)
        else:
            raise SystemExit(f"unknown flag {key}")
        args = args[2:]
    if not args:
        raise SystemExit("no command given")

    child = subprocess.Popen(args, start_new_session=True)
    t0 = time.monotonic()
    last_cpu = -1
    last_advance = t0

    def killpg(sig):
        try:
            os.killpg(child.pid, sig)
        except ProcessLookupError:
            pass

    while True:
        try:
            rc = child.wait(timeout=20)
            return rc
        except subprocess.TimeoutExpired:
            pass
        now = time.monotonic()
        cpu = _subtree_cputime(child.pid)
        if cpu > last_cpu:
            last_cpu = cpu
            last_advance = now
        if wall_timeout is not None and now - t0 > wall_timeout:
            print(f"run_watchdogged: wall timeout {wall_timeout:.0f}s — "
                  f"killing", file=sys.stderr, flush=True)
            killpg(signal.SIGTERM)
            time.sleep(5)
            killpg(signal.SIGKILL)
            return 124
        if now - last_advance > stall_secs:
            print(f"run_watchdogged: subtree cputime stalled "
                  f"{stall_secs:.0f}s (wedged tunnel RPC) — killing",
                  file=sys.stderr, flush=True)
            killpg(signal.SIGTERM)
            time.sleep(5)
            killpg(signal.SIGKILL)
            return 125


if __name__ == "__main__":
    sys.exit(main())
