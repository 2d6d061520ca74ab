"""Shared argv hygiene for the sweep/soak scripts (r13 verdict
observation: every script stack-traced on ``--help`` and one sweep
accidentally ran 672k seeds because ``n_chunks`` was misread as
``n_seeds``).

Two tiny helpers, both of which print a usage line on ``--help``/``-h``
(exit 0) and a one-line error (exit 2, no traceback) on a non-integer
or out-of-range argument:

- :func:`parse_int_args` — fixed positional ints with names + defaults.
- :func:`parse_int_list` — a variadic int list with a default.
"""

from __future__ import annotations

import sys


def _usage(prog: str, doc: str, params: str) -> str:
    first = (doc or "").strip().splitlines()
    head = first[0] if first else ""
    return f"usage: python {prog} {params}\n  {head}"


def _bail(msg: str) -> "NoReturn":  # noqa: F821 - py<3.11 typing
    print(msg, file=sys.stderr)
    raise SystemExit(2)


def parse_int_args(doc: str, specs: list[tuple],
                   argv: list[str] | None = None,
                   max_value: int = 10_000_000) -> list[int]:
    """``specs`` = [(name, default) or (name, default, cap), ...]
    positional integer params. Returns the parsed values (defaults
    filled in). Rejects extra args, non-integers, negatives, and
    values above the per-arg cap (default ``max_value`` — the
    672k-seed guard: a misplaced argument is far more likely than a
    genuine 10M+ request; seed BASES get a high cap, COUNTS a low
    one)."""
    argv = sys.argv[1:] if argv is None else argv
    params = " ".join(f"[{s[0]}={s[1]}]" for s in specs)
    usage = _usage(sys.argv[0], doc, params)
    if any(a in ("--help", "-h") for a in argv):
        print(usage)
        raise SystemExit(0)
    if len(argv) > len(specs):
        _bail(f"error: expected at most {len(specs)} args, "
              f"got {len(argv)}\n{usage}")
    out = []
    for i, spec in enumerate(specs):
        name, default = spec[0], spec[1]
        cap = spec[2] if len(spec) > 2 else max_value
        if i < len(argv):
            try:
                v = int(argv[i])
            except ValueError:
                _bail(f"error: {name} must be an integer, "
                      f"got {argv[i]!r}\n{usage}")
            if v < 0:
                _bail(f"error: {name} must be >= 0, got {v}\n{usage}")
            if v > cap:
                _bail(f"error: {name}={v} exceeds the sanity cap "
                      f"{cap} (misplaced argument?)\n{usage}")
            out.append(v)
        else:
            out.append(default)
    return out


def parse_int_list(doc: str, name: str, default: list[int],
                   argv: list[str] | None = None,
                   max_value: int = 10_000_000) -> list[int]:
    """Variadic positional integer list (e.g. soak scale factors)."""
    argv = sys.argv[1:] if argv is None else argv
    usage = _usage(sys.argv[0], doc, f"[{name}...={default}]")
    if any(a in ("--help", "-h") for a in argv):
        print(usage)
        raise SystemExit(0)
    if not argv:
        return list(default)
    out = []
    for a in argv:
        try:
            v = int(a)
        except ValueError:
            _bail(f"error: {name} must be integers, got {a!r}\n{usage}")
        if not (0 <= v <= max_value):
            _bail(f"error: {name}={v} out of range [0, {max_value}]"
                  f"\n{usage}")
        out.append(v)
    return out
