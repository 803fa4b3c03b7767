#!/bin/bash
# End-of-round-4 measurement window: run AFTER stopping the wsem
# trainer.  Each step independently resumable; logs under /tmp.
set -x
cd /root/repo

# sort on the trailing step number (sort -V); a field-based sort keyed
# on the underscore-ridden run dir degraded to lexicographic order and
# would pick superPointNet_90000 over _100000 (ADVICE r4, medium)
CKPT=$(ls -d logs/pipeline240_wsem_200k_r4/checkpoints/superPointNet_* | sort -V | tail -1)
echo "latest checkpoint: $CKPT"

# 1. headline benches for the record
timeout 420 python bench.py 2>&1 | tail -1 | tee /tmp/r4_bench.json
timeout 560 python scripts/bench_ha_kitti.py 2>&1 | tail -1 | tee /tmp/r4_bench_ha_kitti.json

# 2. export-vs-bench postprocessing A/B on the fixed corpus (VERDICT #4)
timeout 580 python scripts/ab_postprocess.py --ckpt "$CKPT" \
    --corpus datasets/HPatches --out logs/ab_postprocess \
    2>&1 | tail -14 | tee /tmp/r4_ab_postprocess.txt

# 3. semantic-head eval on the val split (fine 133-class stand-in)
timeout 580 python scripts/eval_wsem_semantic.py "$CKPT" \
    --out evidence/wsem_r4_semantic_metrics.txt 2>&1 | tail -4

# 4. stage-4 checkpoint sweep over the fixed 80-pair corpus
timeout 580 python -m ssp.cli.export_eval configs/pipeline240_sweep_wsem_r4.yaml \
    pipeline240_sweep_r4 2>&1 | tail -3
cp logs/pipeline240_sweep_r4/checkpoints/results.csv evidence/pipeline240_sweep_r4_results.csv 2>/dev/null || true
cp logs/pipeline240_sweep_r4/checkpoints/results_ref.csv evidence/pipeline240_sweep_r4_results_ref.csv 2>/dev/null || true
