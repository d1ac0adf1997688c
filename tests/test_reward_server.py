"""Remote reward wire contract: stdlib server ↔ RemoteReward client."""
import threading
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server_url():
    import socket
    from http.server import ThreadingHTTPServer

    import reward_server.example_server as srv

    # find a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    server = srv.RewardServer()
    thread = threading.Thread(
        target=srv.serve_stdlib, args=(server, port), daemon=True
    )
    thread.start()
    time.sleep(0.3)
    return f"http://127.0.0.1:{port}"


def test_remote_reward_end_to_end(server_url):
    from flow_factory_tpu.hparams.reward_args import RewardArguments
    from flow_factory_tpu.rewards.models import RemoteReward

    args = RewardArguments(
        name="remote", reward_model="Remote", server_url=server_url, timeout=10.0
    )
    model = RemoteReward(args)
    model.setup()
    imgs = [np.full((3, 8, 8), v, np.float32) for v in (0.25, 0.75)]
    scores = model.compute_reward(image=imgs, prompt=["a", "b"])
    # template server scores mean brightness; PNG roundtrip quantizes to uint8
    np.testing.assert_allclose(scores, [0.25, 0.75], atol=0.01)


def test_remote_reward_in_buffer(server_url):
    from flow_factory_tpu.hparams.reward_args import RewardArguments
    from flow_factory_tpu.rewards.models import RemoteReward
    from flow_factory_tpu.rewards.reward_processor import RewardBuffer
    from flow_factory_tpu.samples import BaseSample

    args = RewardArguments(
        name="remote", reward_model="Remote", server_url=server_url,
        timeout=10.0, async_reward=True, num_workers=2,
    )
    buf = RewardBuffer([RemoteReward(args)], group_size=1, distributed_groups=False)
    samples = [
        BaseSample(prompt=f"p{i}", image=np.full((3, 4, 4), 0.1 * i, np.float32))
        for i in range(4)
    ]
    buf.add_samples(samples)
    done = buf.finalize()
    for i, s in enumerate(done):
        assert abs(s.extra_kwargs["reward"] - 0.1 * i) < 0.01
    buf.cleanup()
