"""Tiny argv guard shared by the tools that take a raw out-path positional.

These tools deliberately avoid argparse (the first positional is an output
path, everything after is tool-specific), which once let a stray ``--help``
silently become a results file at the repo root.  Reject flag-looking paths
up front instead.
"""


def check_out(path):
    p = str(path)
    if p.startswith("-"):
        raise SystemExit(
            f"out-path {path!r} looks like a flag, not a path; the first "
            "positional is the output file (see the module docstring)"
        )
    return p
