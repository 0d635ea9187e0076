#!/bin/sh
# Build the reference bwa-meme binary from /root/reference into a scratch dir.
#
# Usage: tools/build_reference.sh [BUILDDIR]   (default /tmp/refbuild)
#
# The binary is the SAM-parity and performance oracle
# (reference: README.md:80-92 documents diff-equality as the correctness
# contract). USE_MIMALLOC=0 avoids the vendored allocator; arch=avx2
# matches this host. MODE=3 is the reference default (fastest, 118 GB
# for human; tiny for test contigs).
set -e
BUILD="${1:-/tmp/refbuild}"
if [ -x "$BUILD/bwa-meme" ]; then
    echo "$BUILD/bwa-meme"
    exit 0
fi
mkdir -p "$BUILD"
cp -r /root/reference/. "$BUILD"
make -C "$BUILD" USE_MIMALLOC=0 MODE=3 arch=avx2 -j"$(nproc)" >"$BUILD/build.log" 2>&1
test -x "$BUILD/bwa-meme"
echo "$BUILD/bwa-meme"
