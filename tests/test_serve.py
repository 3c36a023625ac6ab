"""Inference-server tests: health, predict, validation errors — over a real
HTTP socket against the fused coupled-rollout model."""

import json
import threading
from http.client import HTTPConnection

import jax
import numpy as np
import pytest

from eegflow.cli.serve import serve
from eegflow.core.config import CouplingConfig, ModelConfig
from eegflow.couple.rollout import CoupledModel, predict_batch
from eegflow.nn.model import classifier_init
from eegflow.ode import rates_to_array
from eegflow.ode.field import DEFAULT_RATES

TOY_CFG = ModelConfig(input_size=4, hidden_size=16, num_layers=1, dropout=0.0)


@pytest.fixture(scope="module")
def server():
    model = CoupledModel(
        params=classifier_init(jax.random.key(0), TOY_CFG),
        model_cfg=TOY_CFG,
        k_base=rates_to_array(DEFAULT_RATES),
        coupling=CouplingConfig(),
    )
    httpd = serve(model, host="127.0.0.1", port=0, warmup_seq_len=16)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address, model
    httpd.shutdown()


def _request(addr, method, path, payload=None):
    conn = HTTPConnection(*addr, timeout=30)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"} if body else {})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_health(server):
    addr, _ = server
    status, out = _request(addr, "GET", "/health")
    assert status == 200
    assert out["status"] == "ok"
    assert out["model"]["input_size"] == 4


def test_predict_matches_direct_rollout(server, rng):
    addr, model = server
    windows = rng.standard_normal((3, 16, 4)).astype(np.float32)
    status, out = _request(addr, "POST", "/predict",
                           {"windows": windows.tolist()})
    assert status == 200
    direct = predict_batch(model, windows)
    np.testing.assert_allclose(out["probs"], direct["probs"], atol=1e-5)
    assert out["pred_binary"] == direct["pred_binary"].tolist()
    assert "trajectories" not in out


def test_predict_with_trajectories(server, rng):
    addr, _ = server
    windows = rng.standard_normal((2, 16, 4)).astype(np.float32)
    status, out = _request(addr, "POST", "/predict",
                           {"windows": windows.tolist(), "trajectories": True})
    assert status == 200
    traj = np.asarray(out["trajectories"])
    assert traj.shape == (2, 20, 3)
    np.testing.assert_allclose(traj.sum(-1), 1.0, atol=1e-4)


def test_predict_validation_errors(server):
    addr, _ = server
    status, out = _request(addr, "POST", "/predict", {"windows": [[1, 2]]})
    assert status == 400 and "N, T, C" in out["error"]
    status, out = _request(addr, "POST", "/predict",
                           {"windows": np.zeros((1, 16, 7)).tolist()})
    assert status == 400 and "channels" in out["error"]
    status, out = _request(addr, "POST", "/predict", {"wrong_key": 1})
    assert status == 400
    status, out = _request(addr, "GET", "/nope")
    assert status == 404
