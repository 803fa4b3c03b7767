#!/usr/bin/env bash
# Convenience: HPatches export then evaluation (reference run_export.sh).
set -euo pipefail
CONFIG=${1:-configs/magicpoint_repeatability_heatmap.yaml}
EXPER=${2:-hp_eval}
python -m ssp.cli.export export_descriptor "$CONFIG" "$EXPER"
python -m ssp.cli.evaluate "logs/$EXPER/predictions" -r -homo
