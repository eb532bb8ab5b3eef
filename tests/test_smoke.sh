#!/bin/bash
# Fast smoke tier (~2.5 min cold on a 1-core host): the pass/fail signal for
# cold environments/CI without the 30+-minute full suite (tests/test_all.sh).
#
# Covers: scheduler math (pure functions), dataset loaders + result tree, and
# both CLIs end-to-end on the tiny model — test_cli runs edit_image.py /
# invert_image.py main() through the whole L0-L4 stack (model load, inversion
# scan, editor, postprocess, png write), so every layer executes once.
set -o pipefail
exec python -m pytest tests/test_schedulers.py tests/test_data.py \
    tests/test_cli.py -q
