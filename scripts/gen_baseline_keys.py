#!/usr/bin/env python
"""Generate baseline_keys.json — the machine-readable per-key runtime
envelope (sf0.1 seconds) that bench.py uses to compute its envelope_ratio
summary line.

Envelope per key = min over every recorded sighting:
- the `| key | 0.1 | sec |` rows of BASELINE.md's measurement tables
  (first-stable-measurement baselines and re-pins), and
- the per-key maps of every parseable BENCH_r*.json driver artifact.

Run from the repo root after adding BASELINE.md rows for new keys:
    python scripts/gen_baseline_keys.py
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    env: dict[str, float] = {}

    def sight(key: str, sec: float) -> None:
        if sec > 0:
            env[key] = min(env.get(key, sec), sec)

    row_re = re.compile(
        r"^\|\s*([a-z][a-z0-9_]+)[^|]*\|\s*0\.1\s*\|\s*([0-9.]+)\s*\|\s*(REPIN)?"
    )
    repins: dict[str, float] = {}
    for line in (ROOT / "BASELINE.md").read_text().splitlines():
        m = row_re.match(line)
        if m:
            if m.group(3):
                # REPIN rows OVERRIDE the historical minimum: a stale
                # best-case the current host can't reproduce was formally
                # re-measured and replaced (BASELINE.md section 10).
                repins[m.group(1)] = float(m.group(2))
            else:
                sight(m.group(1), float(m.group(2)))

    for f in sorted(glob.glob(str(ROOT / "BENCH_r*.json"))):
        d = json.loads(Path(f).read_text())
        parsed = d.get("parsed")
        queries = (parsed or {}).get("queries") if isinstance(parsed, dict) else None
        if queries:
            for k, v in queries.items():
                sight(k, float(v))

    env.update(repins)
    out = ROOT / "baseline_keys.json"
    out.write_text(json.dumps(dict(sorted(env.items())), indent=1) + "\n")
    print(f"wrote {out} with {len(env)} keys")


if __name__ == "__main__":
    main()
