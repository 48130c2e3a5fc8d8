#!/usr/bin/env bash
# Fetch the OpenAI CLIP tokenizer assets (vocab.json + merges.txt) that the
# reference consumes through CLIPProcessor.from_pretrained
# (`dataset_creation/pretrain/pretrain_dataset.py:15`).
#
# Run this once on a machine with network access; pigeon_tpu's
# `load_tokenizer()` picks the files up from data/clip_vocab/ and falls back
# to a clearly-named HashTokenizer when they are absent.
set -euo pipefail

DEST="${1:-data/clip_vocab}"
BASE="https://huggingface.co/openai/clip-vit-large-patch14/resolve/main"

mkdir -p "$DEST"
curl -L --fail -o "$DEST/vocab.json" "$BASE/vocab.json"
curl -L --fail -o "$DEST/merges.txt" "$BASE/merges.txt"

python - "$DEST" <<'EOF'
import json, sys
dest = sys.argv[1]
with open(f"{dest}/vocab.json") as f:
    vocab = json.load(f)
assert len(vocab) == 49408, f"unexpected vocab size {len(vocab)}"
assert vocab["<|endoftext|>"] == 49407
print(f"OK: {len(vocab)} tokens in {dest}")
EOF
