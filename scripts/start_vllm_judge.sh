#!/usr/bin/env bash
# Launch an OpenAI-compatible vLLM judge server for LLM-based rewards
# (counterpart of the reference's start_vllm_rational_reward.sh).
#
# Env knobs:
#   JUDGE_MODEL          model name or local path (required)
#   TENSOR_PARALLEL_SIZE vLLM TP degree            (default 1)
#   DATA_PARALLEL_SIZE   vLLM DP degree            (default 1)
#   PORT                 server port               (default 8100)
#   MAX_MODEL_LEN        context window            (default 8192)
set -euo pipefail

: "${JUDGE_MODEL:?set JUDGE_MODEL to a model name or local path}"
PORT="${PORT:-8100}"
TP="${TENSOR_PARALLEL_SIZE:-1}"
DP="${DATA_PARALLEL_SIZE:-1}"
MAX_LEN="${MAX_MODEL_LEN:-8192}"

exec python -m vllm.entrypoints.openai.api_server \
  --model "$JUDGE_MODEL" \
  --port "$PORT" \
  --tensor-parallel-size "$TP" \
  --data-parallel-size "$DP" \
  --max-model-len "$MAX_LEN" \
  --trust-remote-code
