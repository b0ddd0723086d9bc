#!/bin/bash
# VERDICT r2 item 8: exercise the multi-host path end to end at GDELT scale
# (synthetic substitute — upstream ships no GDELT splits). Two runs with the
# same seed, both CPU f32 so the comparison is exact:
#   control    single process, no mesh
#   multihost  2 processes x 4 CPU devices via launchers/run_multihost.sh
#              (jax.distributed + global data mesh, the reference's DDP)
# Done-criterion: per-epoch loss/val-MRR trajectories match; per-process
# epoch timings are printed by each rank into the shared log.
set -e
cd /root/repo
OUT=results/round3/gdelt_multihost
mkdir -p "$OUT"
COMMON=(-c grid/gdelt/config_bigrrgcn.json --data-root "$PWD/.data_local"
        --impute --max-nb-epochs 10 --patience 50
        --experiments-dir "$OUT")

if [ ! -f "$OUT/control/metrics.jsonl" ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python main.py "${COMMON[@]}" --model-name control \
    > "$OUT/control.log" 2>&1
fi
tail -2 "$OUT/control.log"

if [ ! -f "$OUT/multihost/metrics.jsonl" ]; then
  bash launchers/run_multihost.sh "${COMMON[@]}" --model-name multihost \
    > "$OUT/multihost.log" 2>&1
fi
tail -2 "$OUT/multihost.log"

python - <<'EOF'
import json
a = [json.loads(l) for l in open("results/round3/gdelt_multihost/control/metrics.jsonl")]
b = [json.loads(l) for l in open("results/round3/gdelt_multihost/multihost/metrics.jsonl")]
print(f"{'ep':>3} {'ctl loss':>10} {'mh loss':>10} {'ctl mrr':>8} {'mh mrr':>8} {'ctl s':>6} {'mh s':>6}")
ok = True
for ra, rb in zip(a, b):
    da = abs(ra["train_loss"] - rb["train_loss"]) / max(abs(ra["train_loss"]), 1e-9)
    dm = abs(ra["val"]["mrr"] - rb["val"]["mrr"])
    ok &= da < 2e-3 and dm < 2e-3
    print(f"{ra['epoch']:>3} {ra['train_loss']:>10.4f} {rb['train_loss']:>10.4f} "
          f"{ra['val']['mrr']:>8.4f} {rb['val']['mrr']:>8.4f} "
          f"{ra['train_s']:>6.1f} {rb['train_s']:>6.1f}")
print("TRAJECTORIES MATCH" if ok else "TRAJECTORY MISMATCH")
EOF
