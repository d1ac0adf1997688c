"""VLM-judge HTTP behavior against a local fake OpenAI-compatible server
(VERDICT r2 Next #6): batch concurrency (N requests genuinely in flight),
rubric-formatted reply parsing end-to-end, retry-then-success, and the
message structure the judge checkpoints were trained on.
"""
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from flow_factory_tpu.hparams.reward_args import RewardArguments
from flow_factory_tpu.rewards.vllm_judge import (
    RationalRewardEdit,
    RationalRewardT2I,
    VLLMJudgeReward,
)

_T2I_REPLY = """# User Request Analysis
ok
# Detailed Judgement
1. Text Faithfulness:
## Justification: fine
## Score: 4.0
2. Physical and Visual Quality:
## Justification: fine
## Score: 4.0
3. Text Rendering:
## Justification: none requested
## Score: N/A
# Summary: good."""

_EDIT_REPLY = """# Detailed Judgement
1. Text Faithfulness:
## Score: 4
2. Image Faithfulness:
## Score: 4
3. Physical and Visual Quality:
## Score: 4
4. Text Rendering:
## Score: N/A
# Summary: clean edit."""


class _FakeVLLM:
    """OpenAI-compatible /v1/chat/completions with concurrency accounting."""

    def __init__(self, reply, hold_s=0.15, fail_first=0):
        self.reply = reply
        self.hold_s = hold_s
        self.fail_first = fail_first
        self.lock = threading.Lock()
        self.in_flight = 0
        self.max_in_flight = 0
        self.requests = []
        self.n = 0

        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
                with fake.lock:
                    fake.n += 1
                    n = fake.n
                    fake.requests.append(body)
                    fake.in_flight += 1
                    fake.max_in_flight = max(fake.max_in_flight, fake.in_flight)
                try:
                    if n <= fake.fail_first:
                        self.send_error(500, "transient")
                        return
                    time.sleep(fake.hold_s)
                    reply = fake.reply(body) if callable(fake.reply) else fake.reply
                    out = json.dumps(reply).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(out)))
                    self.end_headers()
                    self.wfile.write(out)
                finally:
                    with fake.lock:
                        fake.in_flight -= 1

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.server.server_address[1]}"

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def _chat_reply(text):
    return {"choices": [{"message": {"content": text}}]}


def _args(url, **extra):
    return RewardArguments.from_dict({
        "name": "judge", "reward_model": "rational_rewards_t2i",
        "server_url": url, "timeout": 10.0, "retry_attempts": 3, **extra,
    })


def _imgs(n):
    return [np.random.RandomState(i).rand(3, 8, 8).astype(np.float32) for i in range(n)]


def test_rational_t2i_scores_batch_concurrently():
    srv = _FakeVLLM(_chat_reply(_T2I_REPLY), hold_s=0.25)
    try:
        j = RationalRewardT2I(_args(srv.url, extra_kwargs={"max_concurrent": 6}))
        j.setup()
        t0 = time.time()
        rewards = j.compute_reward(image=_imgs(6), prompt=["p"] * 6)
        elapsed = time.time() - t0
    finally:
        srv.stop()
    np.testing.assert_allclose(rewards, np.full(6, 1.0))  # (mean(4,4)-1)/3
    assert srv.max_in_flight >= 4, f"requests were serial (max in flight {srv.max_in_flight})"
    assert elapsed < 6 * 0.25, "wall-clock shows serial scoring"
    # message structure: system prompt + [text, image_url, text] user content
    msg = srv.requests[0]["messages"]
    assert msg[0]["role"] == "system" and "image generation evaluator" in msg[0]["content"]
    kinds = [c["type"] for c in msg[1]["content"]]
    assert kinds == ["text", "image_url", "text"]
    assert "Scoring Rubric" in msg[1]["content"][2]["text"]
    assert "Text Faithfulness" in msg[1]["content"][2]["text"]


def test_rational_t2i_retries_transport_errors():
    srv = _FakeVLLM(_chat_reply(_T2I_REPLY), hold_s=0.0, fail_first=2)
    try:
        j = RationalRewardT2I(_args(srv.url, extra_kwargs={"max_concurrent": 1,
                                                           "max_retries": 5}))
        j.setup()
        rewards = j.compute_reward(image=_imgs(1), prompt=["p"])
    finally:
        srv.stop()
    np.testing.assert_allclose(rewards, [1.0])
    assert srv.n >= 3  # two failures + one success


def test_rational_t2i_unparseable_reply_scores_zero():
    srv = _FakeVLLM(_chat_reply("I refuse to follow the format."))
    try:
        j = RationalRewardT2I(_args(srv.url))
        j.setup()
        rewards = j.compute_reward(image=_imgs(2), prompt=["p", "q"])
    finally:
        srv.stop()
    np.testing.assert_allclose(rewards, [0.0, 0.0])


def test_rational_edit_sends_source_and_edited_images():
    srv = _FakeVLLM(_chat_reply(_EDIT_REPLY))
    try:
        j = RationalRewardEdit(_args(srv.url))
        j.setup()
        rewards = j.compute_reward(
            image=_imgs(1), prompt=["make it red"],
            images=[[np.zeros((3, 8, 8), np.float32)]],
        )
    finally:
        srv.stop()
    np.testing.assert_allclose(rewards, [1.0])
    content = srv.requests[0]["messages"][1]["content"]
    kinds = [c["type"] for c in content]
    assert kinds == ["text", "image_url", "text", "image_url", "text"]
    assert "Source Image" in content[0]["text"]
    assert "Edited Image" in content[2]["text"]
    assert "Image Faithfulness" in content[4]["text"]


def test_vllm_evaluate_p_yes_over_logprobs_and_cache():
    def reply(body):
        assert body["max_tokens"] == 1 and body["logprobs"] is True
        return {"choices": [{"logprobs": {"content": [{"top_logprobs": [
            {"token": "Yes", "logprob": float(np.log(0.7))},
            {"token": "No", "logprob": float(np.log(0.1))},
        ]}]}, "message": {"content": "Yes"}}]}

    srv = _FakeVLLM(reply)
    try:
        j = VLLMJudgeReward(_args(srv.url))
        j.setup()
        img = _imgs(1)[0]
        r1 = j.compute_reward(image=[img], prompt=["p"])
        r2 = j.compute_reward(image=[img], prompt=["p"])  # cache hit
    finally:
        srv.stop()
    np.testing.assert_allclose(r1, [0.875])  # 0.7 / 0.8
    np.testing.assert_allclose(r2, [0.875])
    assert srv.n == 1, "identical image should be served from the FIFO cache"
