#!/usr/bin/env python3
"""Idempotent refresh + sanity guard for BASELINE.md's measured-results block.

Round 7's artifact freeze destroyed BASELINE.md: a sed-style refresh matched
its own replacement text and re-inserted it ~6,781 times (6.8 KB -> 6.7 MB),
wiping the reference-anchor tables. This script is the replacement discipline:

- `--refresh NEWBLOCK.md` replaces ONLY the span between the literal markers
  `<!-- measured:begin -->` and `<!-- measured:end -->` (markers retained).
  Replacing a delimited span is idempotent by construction: running it twice
  with the same block is a no-op.
- `--check` (also run automatically after --refresh) fails unless:
    * exactly one begin marker and one end marker, begin before end,
    * exactly one `## Measured results` heading,
    * file size < 64 KB,
    * the pre-marker prefix still contains the reference-anchor table
      (the round-6 content restored from `git show d484127:BASELINE.md`).

Wire `--check` into the round-artifact checklist before every freeze commit.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

BEGIN = "<!-- measured:begin -->"
END = "<!-- measured:end -->"
MAX_BYTES = 64 * 1024


def check(path: Path) -> list[str]:
    errors: list[str] = []
    data = path.read_bytes()
    if len(data) >= MAX_BYTES:
        errors.append(f"{path} is {len(data)} bytes (limit {MAX_BYTES}) — duplication suspected")
    text = data.decode("utf-8", errors="replace")
    nb, ne = text.count(BEGIN), text.count(END)
    if nb != 1 or ne != 1:
        errors.append(f"expected exactly one marker pair, found begin={nb} end={ne}")
    elif text.index(BEGIN) > text.index(END):
        errors.append("begin marker appears after end marker")
    nh = text.count("## Measured results")
    if nh != 1:
        errors.append(f"expected exactly one '## Measured results' heading, found {nh}")
    if "# BASELINE" not in text.split(BEGIN)[0]:
        errors.append("reference-anchor prefix missing before the measured block")
    if "app_config.go" not in text.split(BEGIN)[0]:
        errors.append("reference-anchor table (app_config.go citations) missing from prefix")
    return errors


def refresh(path: Path, block_path: Path) -> None:
    text = path.read_text()
    errs = check(path)
    if errs:
        raise SystemExit("refusing to refresh a file that already fails checks:\n  " + "\n  ".join(errs))
    block = block_path.read_text().strip("\n")
    if BEGIN in block or END in block:
        raise SystemExit("replacement block must not itself contain the markers")
    head, rest = text.split(BEGIN, 1)
    _, tail = rest.split(END, 1)
    path.write_text(f"{head}{BEGIN}\n{block}\n{END}{tail}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--file", default=str(Path(__file__).resolve().parent.parent / "BASELINE.md"))
    ap.add_argument("--refresh", metavar="NEWBLOCK_MD", help="file whose contents replace the measured span")
    ap.add_argument("--check", action="store_true", help="validate only")
    args = ap.parse_args()
    path = Path(args.file)
    if args.refresh:
        refresh(path, Path(args.refresh))
    errs = check(path)
    if errs:
        print("BASELINE.md GUARD FAILED:", file=sys.stderr)
        for e in errs:
            print(f"  - {e}", file=sys.stderr)
        return 1
    print(f"BASELINE.md ok: {path.stat().st_size} bytes, one measured block")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
