#!/bin/sh
# Generate markdown API docs into docs/api/ (reference: pdoc.sh).
cd "$(dirname "$0")"
python docs/generate.py
