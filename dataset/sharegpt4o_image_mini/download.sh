#!/usr/bin/env bash
# Fetch the ShareGPT-4o-Image mini split used by the image-editing examples.
# This environment has no egress; run on a connected machine:
#
#   pip install -U "huggingface_hub[cli]"
#   hf download FreedomIntelligence/ShareGPT-4o-Image \
#       --repo-type dataset --local-dir ./sharegpt4o_image \
#   && python -c "import json,itertools;  \
#       rows=[json.loads(l) for l in itertools.islice(open('sharegpt4o_image/train.jsonl'),200)]; \
#       open('train.jsonl','w').writelines(json.dumps(r)+'\n' for r in rows)"
#
# Until real data is present, the bundled placeholder.jsonl (original
# prompts + generated placeholder images) keeps the config runnable.
set -euo pipefail
echo "See comments in this script for the download recipe."
