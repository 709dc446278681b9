#!/usr/bin/env bash
# Batch monocular pipeline: preprocess -> track -> export (one dir per video).
# Equivalent of the reference's jobs/run_monocular.sh.
set -euo pipefail

ROOT=${1:?usage: run_monocular.sh <data_root> [output_root]}
OUT=${2:-output/monocular}

for video in "$ROOT"/*.mp4; do
    name=$(basename "$video" .mp4)
    echo "=== $name ==="

    python -m vhap_tpu.preprocess.video --input "$video" \
        --matting_method robust_video_matting

    python -m vhap_tpu.track \
        --data.root_folder "$ROOT" \
        --data.sequence "$name" \
        --exp.output_folder "$OUT/$name"

    # completeness check (reference: tracked_flame_params_30.npz)
    latest=$(ls -d "$OUT/$name"/*/ | sort | tail -1)
    if [ ! -f "$latest/tracked_flame_params_30.npz" ]; then
        echo "WARNING: $name incomplete (no tracked_flame_params_30.npz)"
        continue
    fi

    python -m vhap_tpu.export_as_nerf_dataset \
        --src_folder "$OUT/$name" \
        --tgt_folder "$OUT/export/$name"
done
