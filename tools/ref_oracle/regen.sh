#!/bin/bash
# Regenerate ALL tests/data/golden/* from the UNMODIFIED reference
# (VERDICT r2 #7): builds the reference headlessly, builds ref_dump
# against it, re-dumps every golden byte-exact, and diffs.
#
#   tools/ref_oracle/regen.sh [--check]
#
# --check (default): regenerate into a temp dir and diff against the
# checked-in goldens (exit 1 on any mismatch).  --write: overwrite the
# checked-in goldens in place.
#
# Pinned payloads are extracted from the existing golden metas so the
# regeneration is self-contained; fresh payloads can be passed through
# ref_dump's --payload* flags when deriving new vectors.
set -euo pipefail

REF_SRC=${REF_SRC:-/root/reference}
REF_BUILD=${REF_BUILD:-/tmp/refbuild}
ORACLE_BUILD=${ORACLE_BUILD:-/tmp/oracle_build}
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
G="$REPO/tests/data/golden"
MODE=${1:---check}
if [ "$MODE" = "--write" ]; then OUT="$G"; else OUT=$(mktemp -d); fi

echo "[1/4] reference headless build ($REF_BUILD)"
mkdir -p "$REF_BUILD"
(cd "$REF_BUILD" && cmake "$REF_SRC" -DULTRA_BUILD_GUI=OFF \
    -DULTRA_BUILD_TESTS=OFF -GNinja >/dev/null && ninja ultra >/dev/null)

echo "[2/4] ref_dump build ($ORACLE_BUILD)"
mkdir -p "$ORACLE_BUILD"
(cd "$ORACLE_BUILD" && cmake "$HERE" -DREF_SRC="$REF_SRC" \
    -DREF_BUILD="$REF_BUILD" -GNinja >/dev/null && ninja >/dev/null)
D="$ORACLE_BUILD/ref_dump"

echo "[3/4] dump goldens -> $OUT"
meta() { awk -v k="$2" '$1==k{print $2}' "$G/$1"; }
LDPC_ARGS=""
for R in R1_4 R1_2 R2_3 R3_4 R5_6; do
    LDPC_ARGS="$LDPC_ARGS --payload-$R $(meta golden_ldpc_$R.txt payload)"
    LDPC_ARGS="$LDPC_ARGS --payload2-$R $(meta golden_ldpc_$R.txt payload2)"
done
$D ldpc --out "$OUT" $LDPC_ARGS
$D interleaver --out "$OUT"
$D chinterleaver --out "$OUT"
$D frames --out "$OUT"
$D adaptive --out "$OUT"
$D ofdm --out "$OUT" --payload "$(meta golden_ofdm_tx_meta.txt payload)" 2>/dev/null
$D mcdpsk --out "$OUT" --payload "$(meta golden_mcdpsk_meta.txt payload)" 2>/dev/null
$D dpsk --out "$OUT" --payload "$(meta golden_dpsk_meta.txt payload)" 2>/dev/null
$D otfs --out "$OUT" --payload "$(meta golden_otfs_meta.txt payload)" 2>/dev/null

U="$REF_BUILD/ultra"
$U ptx ping -s AA1AA -d BB2BB 2>/dev/null > "$OUT/ref_cli_tx_ping.f32"
$U ptx connect -s AA1AA -d BB2BB 2>/dev/null > "$OUT/ref_cli_tx_connect.f32"
$U ptx disconnect -s AA1AA -d BB2BB 2>/dev/null > "$OUT/ref_cli_tx_disconnect.f32"
$U ptx "interop payload 123" -s AA1AA -d BB2BB -w ofdm 2>/dev/null \
    > "$OUT/ref_cli_tx_ofdm.f32"
$U ptx "dpsk interop" -s AA1AA -d BB2BB -w dpsk 2>/dev/null \
    > "$OUT/ref_cli_tx_dpsk_mapped.f32"
$U ptx "Interop test message" -s W1AW -d VE3ABC 2>/dev/null \
    > "$OUT/ref_cli_tx_mcdpsk.f32"

echo "[4/4] diff vs checked-in goldens"
FAIL=0
for f in "$G"/*; do
    b=$(basename "$f")
    if cmp -s "$f" "$OUT/$b"; then echo "  OK   $b"
    else echo "  DIFF $b"; FAIL=1; fi
done
[ $FAIL -eq 0 ] && echo "RESULT: PASS (all $(ls "$G" | wc -l) goldens byte-exact)" \
    || echo "RESULT: FAIL"
exit $FAIL
