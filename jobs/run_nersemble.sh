#!/usr/bin/env bash
# Batch NeRSemble multiview pipeline over subjects/sequences.
# Equivalent of the reference's jobs/run_nersemble.sh.
set -euo pipefail

ROOT=${1:?usage: run_nersemble.sh <nersemble_root> <subject> [sequences...]}
SUBJECT=${2:?subject id, e.g. 018}
shift 2
SEQUENCES=("${@:-EXP-1}")
OUT=output/nersemble

for seq in "${SEQUENCES[@]}"; do
    echo "=== $SUBJECT / $seq ==="
    python -m vhap_tpu.track_nersemble \
        --data.root_folder "$ROOT" \
        --data.subject "$SUBJECT" \
        --data.sequence "$seq" \
        --data.n_downsample_rgb 4 \
        --exp.output_folder "$OUT/${SUBJECT}_${seq}"

    python -m vhap_tpu.export_as_nerf_dataset \
        --src_folder "$OUT/${SUBJECT}_${seq}" \
        --tgt_folder "$OUT/export/${SUBJECT}_${seq}"
done
