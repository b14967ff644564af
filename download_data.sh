#!/bin/bash
# Fetch the pre-extracted features + GloVe vectors used by the BMT pipeline
# (same public archives as the reference, md5-verified), unpack under ./data.
#
# --scorers: best-effort probe for the OFFICIAL scorer assets the offline
# METEOR stand-in lacks (meteor-1.5.jar + WordNet synonyms). Fails soft:
# each attempt logs success or the exact failure, so an egress-less host
# leaves a record proving the assets are unreachable (see PARITY.md §4).
set -u

DATA_DIR="./data"
BASE_URL="https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a/bmt"

fetch_scorers() {
  mkdir -p "$DATA_DIR/scorers"
  local log="$DATA_DIR/scorers/probe.log"
  # append (never truncate): the log is the committed round-over-round
  # record that the jar/WordNet remain unfetchable from this host
  echo "probe run: $(date -u +%Y-%m-%dT%H:%M:%SZ) on $(hostname)" \
    | tee -a "$log"
  local jar_urls=(
    "https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/meteor-1.5.jar"
    "https://raw.githubusercontent.com/salaniz/pycocoevalcap/master/meteor/meteor-1.5.jar"
  )
  local ok_jar=""
  for url in "${jar_urls[@]}"; do
    echo "probing $url" | tee -a "$log"
    if wget -q --timeout=30 -O "$DATA_DIR/scorers/meteor-1.5.jar" "$url" \
        && [ -s "$DATA_DIR/scorers/meteor-1.5.jar" ]; then
      ok_jar=1
      echo "  OK ($(stat -c%s "$DATA_DIR/scorers/meteor-1.5.jar") bytes)" \
        | tee -a "$log"
      break
    fi
    echo "  FAILED (exit=$?, egress blocked or URL gone)" | tee -a "$log"
    rm -f "$DATA_DIR/scorers/meteor-1.5.jar"
  done
  if [ -n "$ok_jar" ] && command -v java >/dev/null; then
    echo "export METEOR_JAR=$DATA_DIR/scorers/meteor-1.5.jar" | tee -a "$log"
  elif [ -n "$ok_jar" ]; then
    echo "jar fetched but no java on PATH — METEOR_JAR unusable here" \
      | tee -a "$log"
  fi
  echo "probing nltk wordnet download" | tee -a "$log"
  local py
  py=$(command -v python3 || command -v python) || {
    echo "  FAILED: no python interpreter on PATH" | tee -a "$log"
    return
  }
  "$py" - >> "$log" 2>&1 <<'PYEOF'
try:
    import nltk
    ok = nltk.download('wordnet', quiet=True)
    print(f'  nltk wordnet download: {"OK" if ok else "FAILED"}')
except Exception as e:
    print(f'  FAILED: {type(e).__name__}: {e}')
PYEOF
  tail -1 "$log"
  echo "probe log: $log"
}

if [ "${1:-}" = "--scorers" ]; then
  fetch_scorers
  exit 0
fi

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
