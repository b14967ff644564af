#!/bin/bash
# Fetch the pre-extracted features + GloVe vectors used by the BMT pipeline
# (same public archives as the reference, md5-verified), unpack under ./data.
set -u

DATA_DIR="./data"
BASE_URL="https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/bmt"

declare -A MD5S=(
  [i3d_25fps_stack64step64_2stream_npy.zip]=d7266e440f8c616acbc0d8aaa4a336dc
  [vggish_npy.zip]=9a654ad785e801aceb70af2a5e1cffbe
  [glove.840B.300d.zip]=2ffafcc9f9ae46fc8c95f32372976137
)

if ! command -v wget >/dev/null; then
  echo "wget not found — install it or download the archives manually:"
  for f in "${!MD5S[@]}"; do
    echo "  $BASE_URL/$f   (md5: ${MD5S[$f]})"
  done
  exit 1
fi

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

for f in "${!MD5S[@]}"; do
  if [ ! -f "$f" ]; then
    echo "downloading $f ..."
    wget "$BASE_URL/$f" -q --show-progress
  fi
  got=$(md5sum "$f" | cut -d' ' -f1)
  if [ "$got" != "${MD5S[$f]}" ]; then
    echo "MD5 MISMATCH for $f: got $got expected ${MD5S[$f]}" >&2
    exit 1
  fi
  echo "$f md5 OK — unpacking"
  unzip -q -o "$f"
done

echo "done. Features under $DATA_DIR/{i3d_25fps_stack64step64_2stream_npy,vggish_npy}"
echo "GloVe under $DATA_DIR/glove.840B.300d.txt (pass via --glove_path)"
