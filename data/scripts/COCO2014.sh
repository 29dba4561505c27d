#!/bin/bash
# Fetch + unpack MS-COCO 2014 images + annotations into data/coco.
# Counterpart of the reference's data/scripts/COCO2014.sh.
# Usage: ./COCO2014.sh [target_dir]
set -euo pipefail

TARGET="${1:-$(cd "$(dirname "$0")/.." && pwd)/coco}"
mkdir -p "$TARGET/images" "$TARGET/annotations"
cd "$TARGET"

IMG_BASE="http://images.cocodataset.org/zips"
ANN_BASE="http://images.cocodataset.org/annotations"

for z in train2014.zip val2014.zip; do
    echo "downloading $z ..."
    curl -LO "$IMG_BASE/$z"
    echo "extracting $z ..."
    unzip -q "$z" -d images
    rm -f "$z"
done

echo "downloading annotations_trainval2014.zip ..."
curl -LO "$ANN_BASE/annotations_trainval2014.zip"
unzip -q annotations_trainval2014.zip
rm -f annotations_trainval2014.zip

echo "COCO2014 ready under $TARGET"
