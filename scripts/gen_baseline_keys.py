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
    # Every sighting carries the round it was recorded in, so a REPIN (which
    # replaces a stale pre-repin minimum) only overrides sightings recorded
    # BEFORE it — a faster legitimate measurement from a LATER BENCH artifact
    # still lowers the envelope. BASELINE.md first-stable rows count as
    # round 0 (every repin postdates them by construction).
    sightings: dict[str, list[tuple[float, float]]] = {}  # key -> [(sec, round)]

    def sight(key: str, sec: float, rnd: float) -> None:
        if sec > 0:
            sightings.setdefault(key, []).append((sec, rnd))

    row_re = re.compile(
        r"^\|\s*([a-z][a-z0-9_]+)[^|]*\|\s*0\.1\s*\|\s*([0-9.]+)\s*\|\s*(REPIN(?:@r(\d+))?)?"
    )
    repins: dict[str, tuple[float, float]] = {}  # key -> (sec, repin_round)
    for line in (ROOT / "BASELINE.md").read_text().splitlines():
        m = row_re.match(line)
        if m:
            if m.group(3):
                # REPIN@rN rows replace the pre-round-N minimum: a stale
                # best-case the current host can't reproduce was formally
                # re-measured (BASELINE.md section 10). A bare REPIN (no
                # round) keeps the legacy override-everything semantics.
                # If a key accumulates several REPIN rows, the one with the
                # HIGHEST round wins (not file order): a later re-measurement
                # supersedes an earlier one by definition.
                rnd = float(m.group(4)) if m.group(4) else float("inf")
                prev = repins.get(m.group(1))
                if prev is None or rnd >= prev[1]:
                    repins[m.group(1)] = (float(m.group(2)), rnd)
            else:
                sight(m.group(1), float(m.group(2)), 0.0)

    for f in sorted(glob.glob(str(ROOT / "BENCH_r*.json"))):
        bench_round = float(re.search(r"BENCH_r(\d+)", f).group(1))
        d = json.loads(Path(f).read_text())
        parsed = d.get("parsed")
        queries = (parsed or {}).get("queries") if isinstance(parsed, dict) else None
        if queries:
            for k, v in queries.items():
                sight(k, float(v), bench_round)

    env: dict[str, float] = {}
    for key, rows in sightings.items():
        if key in repins:
            # Sightings from the SAME round as the repin count: BENCH_rN.json
            # is measured at the END of round N, after any REPIN@rN row was
            # written, so a same-round driver time postdates the repin and a
            # legitimately faster measurement there lowers the envelope.
            sec, rnd = repins[key]
            env[key] = min([sec] + [s for s, r in rows if r >= rnd])
        else:
            env[key] = min(s for s, _ in rows)
    for key, (sec, _) in repins.items():
        env.setdefault(key, sec)

    out = ROOT / "baseline_keys.json"
    out.write_text(json.dumps(dict(sorted(env.items())), indent=1) + "\n")
    print(f"wrote {out} with {len(env)} keys")


if __name__ == "__main__":
    main()
