#!/bin/bash
# Regenerate every synthetic dataset after a disk wipe (data/ is not
# committed; the VM wipes it between/within rounds). Quantities and
# seed are the round-2/3 standard (CLAUDE.md): MNISTISEG 4000/500/500,
# OMNIISEG 8000/1000/1000, seed 8, plus the synthetic COCO/VOC stand-in
# (tools/make_synthetic_cocovoc.py defaults: coco 800/240, voc 150/80).
# data/fst (databag caches) must start empty: cache filenames don't
# hash image content, so stale bags would silently mismatch new pixels.
set -u
cd /root/repo
rm -rf data/fst data/coco_cache data/voc_cache
mkdir -p data

python - <<'EOF'
from fgn_tpu.data.mnistiseg import MNISTISEG, OMNIISEG
MNISTISEG.create("data/mnistiseg",
                 {"train": 4000, "val": 500, "test": 500}, seed=8)
print("mnistiseg done", flush=True)
OMNIISEG.create("data/omniiseg",
                {"train": 8000, "val": 1000, "test": 1000}, seed=8)
print("omniiseg done", flush=True)
EOF
echo "=== raw iseg rc=$? $(date -u) ==="

python tools/make_synthetic_cocovoc.py
echo "=== cocovoc rc=$? $(date -u) ==="

echo "DATAGEN DONE $(date -u)"
