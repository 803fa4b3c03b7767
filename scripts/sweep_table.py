"""Print an export_eval results.csv as a markdown table (PERF.md style).

Usage: python scripts/sweep_table.py logs/<exper>/checkpoints/results.csv
"""
import csv
import sys

path = sys.argv[1]
rows = list(csv.DictReader(open(path)))
print("| iter | repeat. | MLE | corr@1 | corr@3 | NN mAP | m.score |")
print("|---|---|---|---|---|---|---|")
for r in rows:
    print(
        f"| {r['iter']} | {float(r['repeatability']):.3f} "
        f"| {float(r['localization_err']):.3f} "
        f"| {float(r['correctness_1']):.2f} | {float(r['correctness_3']):.2f} "
        f"| {float(r['nn_map']):.3f} | {float(r['matching_score']):.3f} |"
    )
