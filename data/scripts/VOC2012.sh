#!/bin/bash
# Fetch + unpack PASCAL VOC2012 trainval into data/VOCdevkit.
# Counterpart of the reference's data/scripts/VOC2012.sh.
# Usage: ./VOC2012.sh [target_dir]
set -euo pipefail

TARGET="${1:-$(cd "$(dirname "$0")/.." && pwd)}"
mkdir -p "$TARGET"
cd "$TARGET"

URL="http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar"
echo "downloading VOCtrainval_11-May-2012.tar ..."
curl -LO "$URL"
echo "extracting ..."
tar -xf VOCtrainval_11-May-2012.tar
rm -f VOCtrainval_11-May-2012.tar

echo "VOC2012 ready under $TARGET/VOCdevkit/VOC2012"
