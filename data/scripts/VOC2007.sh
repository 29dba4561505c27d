#!/bin/bash
# Fetch + unpack PASCAL VOC2007 (trainval + test) into data/VOCdevkit.
# Counterpart of the reference's data/scripts/VOC2007.sh; same resulting
# layout (VOCdevkit/VOC2007/{JPEGImages,Annotations,ImageSets}).
# Usage: ./VOC2007.sh [target_dir]   (default: the data/ dir next to this script)
set -euo pipefail

TARGET="${1:-$(cd "$(dirname "$0")/.." && pwd)}"
mkdir -p "$TARGET"
cd "$TARGET"

BASE="http://host.robots.ox.ac.uk/pascal/VOC/voc2007"
for tarball in VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar; do
    echo "downloading $tarball ..."
    curl -LO "$BASE/$tarball"
    echo "extracting $tarball ..."
    tar -xf "$tarball"
    rm -f "$tarball"
done

echo "VOC2007 ready under $TARGET/VOCdevkit/VOC2007"
