#!/bin/sh
# Full-surface oracle refresh at three scales -> CORRECTNESS_full_r5.json.
# Run at session end (touches /tmp/si_builder_busy so the scaling hunt
# skips probes; waits for any in-flight pair first).
set -e
cd "$(dirname "$0")/.."
while [ -f /tmp/si_scaling_pair.lock ]; do sleep 20; done
touch /tmp/si_builder_busy
trap 'rm -f /tmp/si_builder_busy' EXIT
python tools/check_entry.py /root/testdata/sf0.001 --json=/tmp/cf_sf0.001.json
python tools/check_entry.py /root/testdata/sf0.01  --json=/tmp/cf_sf0.01.json
python tools/check_entry.py /root/testdata/sf0.1   --json=/tmp/cf_sf0.1.json
python - <<'PYEOF'
import json
out = {
    "round": 5,
    "note": ("Full-surface oracle run (every queries() entry vs its DuckDB "
             "oracle: row count + sorted columns + exact values) via "
             "tools/check_entry.py --json at THREE scales, on final "
             "round-5 code (ADVICE fixes, compaction, 15 new queries).  "
             "The driver samples ~50 queries; this covers the whole "
             "167-query surface (157 SQL-oracled, 10 rows-only)."),
}
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    out[sf] = json.load(open(f"/tmp/cf_{sf}.json"))
json.dump(out, open("CORRECTNESS_full_r5.json", "w"), indent=1,
          sort_keys=True)
print("wrote CORRECTNESS_full_r5.json")
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    d = out[sf]
    print(sf, "failures:", d.get("n_failures"), "of", d.get("n_queries"))
PYEOF
