#!/usr/bin/env bash
# Combine exported sequences of one subject into a union dataset.
# Equivalent of the reference's jobs/combine_nersemble.sh.
set -euo pipefail

EXPORT_ROOT=${1:?usage: combine_nersemble.sh <export_root> <subject>}
SUBJECT=${2:?subject id}

mapfile -t SRC < <(ls -d "$EXPORT_ROOT/${SUBJECT}_"*/)
python -m vhap_tpu.combine_nerf_datasets \
    --src_folders "${SRC[@]}" \
    --tgt_folder "$EXPORT_ROOT/UNION_${SUBJECT}"
