#!/bin/bash
# Round-5 measurement window: run AFTER stopping the wsem trainer
# (kill $(cat /tmp/wsem.pid)).  Each step independently resumable;
# transcripts under /tmp, artifacts under evidence/.
#
# Differences vs r4_final_window.sh (which the degraded tunnel killed):
#  - tunnel-health gate up front (VERDICT r5 #3) — abort early rather
#    than record garbage;
#  - checkpoint picked by step number (sort -V; ADVICE r4 medium);
#  - A/B runs all three arms incl. the bf16 fast path at 480x640;
#  - perf claims tee'd to evidence/*.json (VERDICT r5 #6).
set -x
cd /root/repo

python - <<'EOF' || { echo "TUNNEL DEGRADED — rerun when healthy"; exit 1; }
import sys, time, jax, jax.numpy as jnp
f = jax.jit(lambda a: a @ a); x = jnp.ones((128, 128))
f(x).block_until_ready()
ts = []
for _ in range(3):
    t0 = time.perf_counter(); f(x).block_until_ready()
    ts.append(time.perf_counter() - t0)
rtt = sorted(ts)[1]
print(f"tunnel RTT {rtt:.3f}s")
sys.exit(0 if rtt < 0.5 else 1)
EOF

CKPT=$(ls -d logs/pipeline240_wsem_200k_r4/checkpoints/superPointNet_* | sort -V | tail -1)
echo "latest checkpoint: $CKPT"

# 1. headline benches for the record (bench.py has its own RTT guard now)
timeout 420 python bench.py 2>&1 | tail -1 | tee /tmp/r5_bench.json
cp /tmp/r5_bench.json evidence/bench_r5.json || true
timeout 420 python bench.py --export-grade 2>&1 | tail -1 | tee /tmp/r5_bench_export_grade.json
cp /tmp/r5_bench_export_grade.json evidence/bench_r5_export_grade.json || true
timeout 560 python scripts/bench_ha_kitti.py --out evidence/bench_ha_kitti_r5.json \
    2>&1 | tee /tmp/r5_bench_ha_kitti.txt
timeout 560 python scripts/bench_down1_ab.py --out evidence/down1_ab_r5.json \
    2>&1 | tail -8 | tee /tmp/r5_down1_ab.txt

# 2. export-vs-bench postprocessing A/B — metric columns at 240x320
#    (fast arms) and the bf16 forward at the packed-profitable 480x640
timeout 580 python scripts/ab_postprocess.py --ckpt "$CKPT" \
    --corpus datasets/HPatches --out logs/ab_postprocess \
    2>&1 | tail -16 | tee /tmp/r5_ab_postprocess.txt
cp logs/ab_postprocess/ab_summary.json evidence/ab_postprocess_240.json || true
timeout 580 python scripts/ab_postprocess.py --ckpt "$CKPT" \
    --corpus datasets/HPatches --out logs/ab_postprocess_480 \
    --size 480 640 --arms exact_gather,fast_bf16 \
    2>&1 | tail -16 | tee /tmp/r5_ab_postprocess_480.txt
cp logs/ab_postprocess_480/ab_summary.json evidence/ab_postprocess_480.json || true

# 3. semantic-head eval on the val split, fine 133-bin protocol
timeout 580 python scripts/eval_wsem_semantic.py "$CKPT" \
    --out evidence/wsem_r5_semantic_fine.txt 2>&1 | tail -4
# ... and the coarse 16-class protocol labels
timeout 580 python scripts/eval_wsem_semantic.py "$CKPT" \
    --sem-labels datasets/COCO240/annotations_coarse \
    --out evidence/wsem_r5_semantic_coarse.txt 2>&1 | tail -4

# 4. stage-4 checkpoint sweep over the fixed 80-pair corpus (the
#    flagship now has ~21 checkpoints; resume-by-skip makes reruns cheap)
timeout 1800 python -m ssp.cli.export_eval configs/pipeline240_sweep_wsem_r4.yaml \
    pipeline240_sweep_r5 2>&1 | tail -3
cp logs/pipeline240_sweep_r5/checkpoints/results.csv evidence/pipeline240_sweep_r5_results.csv 2>/dev/null || true
cp logs/pipeline240_sweep_r5/checkpoints/results_ref.csv evidence/pipeline240_sweep_r5_results_ref.csv 2>/dev/null || true

# 5. SLAM-lane sequence consistency as a *result* (VERDICT r5 #5):
#    50-frame known-motion sequence at KITTI shape + the failure
#    decomposition, plus a subpixel arm to isolate NMS quantization
timeout 580 python scripts/eval_sequence.py --synthetic --ckpt "$CKPT" \
    --size 384 1248 --n-frames 50 --n-scenes 4 \
    --out evidence/sequence_consistency_kitti.json 2>&1 | tail -5
timeout 580 python scripts/eval_sequence.py --synthetic --ckpt "$CKPT" \
    --size 384 1248 --n-frames 50 --n-scenes 4 --subpixel \
    --out evidence/sequence_consistency_kitti_subpix.json 2>&1 | tail -5
timeout 400 python scripts/eval_sequence.py --synthetic --ckpt "$CKPT" \
    --size 240 320 --n-frames 50 \
    --out evidence/sequence_consistency_240_r5.json 2>&1 | tail -5

# 5b. SLAM-lane sequence export through the real CLI over the
#     KITTI_synth drives, then track metrics on the prediction tree
python - <<EOF
import yaml
cfg = yaml.safe_load(open("configs/kitti384_sequence_r5.yaml"))
cfg["pretrained"] = "$CKPT"
yaml.safe_dump(cfg, open("/tmp/kitti384_sequence_r5.yaml", "w"))
EOF
timeout 580 python -m ssp.cli.export export_sequence \
    /tmp/kitti384_sequence_r5.yaml kitti384_seq_r5 2>&1 | tail -3
timeout 300 python scripts/eval_sequence.py \
    --pred logs/kitti384_seq_r5/predictions \
    --out evidence/sequence_kitti_synth_pred_r5.json 2>&1 | tail -4

# 6. refresh the committed test-weights artifact from the final checkpoint
python scripts/make_test_checkpoint.py "$CKPT" evidence/wsem_weights.npz \
    --n-classes 133 | tee evidence/wsem_weights.json
