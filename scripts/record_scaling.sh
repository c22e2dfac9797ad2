#!/usr/bin/env bash
# Record the north_rule scaling evidence: run the two-cluster-size protocol
# at cpu levels 2, 8 and 32 (each leg measured once, every consecutive pair
# reported) and write the blob to SCALING.json at the repo root. The default
# full `bench.py` run embeds that file as `scaling_recorded`, so the driver's
# per-round BENCH capture carries the scaling evidence.
#
# Run on a QUIET box (check /proc/loadavg; the legs are taskset-pinned but
# co-tenant CPU steal still skews them — bench.py records steal% alongside).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py --scaling --scaling-levels "${1:-2,8,32}" | tail -1 > SCALING.json
python -m json.tool SCALING.json > /dev/null  # validate
echo "wrote SCALING.json:"
python - <<'EOF'
import json
d = json.load(open("SCALING.json"))
for p in d["pairs"]:
    print(f'  {p["cpus_lo"]}->{p["cpus_hi"]}: minhash eff {p["minhash_dataset_stage"]["efficiency"]}, '
          f'ceiling eff {p["minhash_hardware_ceiling"]["efficiency"]}, '
          f'pagerank eff {p["pagerank"]["efficiency"]}')
EOF
