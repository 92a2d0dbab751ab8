"""Summarize a chip-agenda output directory (tools/chip_agenda.sh).

Usage: python tools/agenda_digest.py [outdir]   (default tools/agenda_out)

Prints: per-step exit codes, the bench_all table (config / Mpix/s / ms),
the headline bench JSON, the VPU tile-sweep verdict (best tile per
kernel vs the baked default, flagging >5% same-run wins — the bake
threshold from CLAUDE.md), and the tail of any failed step's stderr.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "tools/agenda_out"
    log = os.path.join(out, "agenda.log")
    if os.path.exists(log):
        print("== agenda.log ==")
        print(open(log).read().strip())

    ba = os.path.join(out, "bench_all.out")
    if os.path.exists(ba):
        print("\n== bench_all ==")
        rows = []
        for line in open(ba):
            line = line.strip()
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        for r in rows:
            print(f"{r.get('config', '?'):62s} "
                  f"{r.get('value', 0):>10.1f} {r.get('unit', '')}  "
                  f"({r.get('ms', '?')} ms)")
        if not rows:
            print("(no JSON rows — check bench_all.err)")

    b = os.path.join(out, "bench.out")
    if os.path.exists(b):
        print("\n== headline bench ==")
        for line in open(b):
            if line.strip().startswith("{"):
                print(line.strip())

    sw = os.path.join(out, "vpu_tile_sweep.json")
    if os.path.exists(sw):
        print("\n== VPU tile sweep ==")
        try:
            data = json.load(open(sw))
        except json.JSONDecodeError:
            data = {}
            print("(unparseable — sweep probably truncated)")
        rows = data.get("sweep", [])
        base = next((r for r in rows if r.get("tiles") == "default"), {})
        for r in rows:
            print(f"  {str(r.get('tiles')):16s} rt {r.get('rt_ms')} ms  "
                  f"ti {r.get('ti_ms')} ms")
        for mode, key in (("rt", "rt_ms"), ("ti", "ti_ms")):
            best_name = data.get(f"best_{mode}")
            br = next((r for r in rows if r.get("tiles") == best_name),
                      None)
            if br and isinstance(br.get(key), float) \
                    and isinstance(base.get(key), float):
                gain = 1 - br[key] / base[key]
                print(f"  best_{mode}: {best_name} ({gain:+.1%} vs "
                      f"default)"
                      + ("  << BAKE (>5%)" if gain > 0.05 else ""))

    ts = os.path.join(out, "tpu_sweep.out")
    if os.path.exists(ts):
        print("\n== tpu sweep tests ==")
        tail = open(ts).read().strip().splitlines()
        print("\n".join(tail[-3:]) if tail else "(empty)")

    # surface stderr tails for any failing step recorded in agenda.log
    if os.path.exists(log):
        for line in open(log):
            if "exit=" in line and not line.strip().endswith("exit=0"):
                name = line.split()[0]
                err = os.path.join(out, f"{name}.err")
                if os.path.exists(err):
                    tail = open(err).read().strip().splitlines()[-5:]
                    print(f"\n== {name}.err (tail) ==")
                    print("\n".join(tail))


if __name__ == "__main__":
    main()
