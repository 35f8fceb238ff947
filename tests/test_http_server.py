"""HTTP serving daemon: every route must reproduce the library calls.

The handlers in coskad_tpu/http_server.py do no numerics — these tests pin
that by comparing each endpoint's response against the in-process
AnomalyScorer / StreamingScorer / ExportedScorer on identical inputs, and
exercise the error mapping (400/404/429/501) and both request encodings
(JSON and raw .npy bodies).
"""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from fixtures import make_synthetic_dataset


# ----------------------------------------------------------------- harness


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """Train a tiny checkpoint once, serve it on an ephemeral port."""
    from coskad_tpu.cli import train as train_cli
    from coskad_tpu.http_server import ScoringService, build_server
    from coskad_tpu.serve import AnomalyScorer

    tmp = tmp_path_factory.mktemp("http")
    cfg_path = make_synthetic_dataset(str(tmp), n_train_clips=1,
                                      n_test_clips=1)
    train_cli.main(["--config", cfg_path, "--epochs", "1"])
    ckpt = os.path.join(str(tmp), "checkpoints", "Synthetic", "smoke",
                        "best.ckpt")
    scorer = AnomalyScorer.from_checkpoint(ckpt)
    service = ScoringService(scorer=scorer, source=ckpt, max_streams=2)
    server = build_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    clip_json = os.path.join(
        str(tmp), "pose", "testing",
        sorted(os.listdir(os.path.join(str(tmp), "pose", "testing")))[0])
    try:
        yield {"url": f"http://127.0.0.1:{server.server_address[1]}",
               "scorer": scorer, "clip_json": clip_json, "ckpt": ckpt}
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def call(url, method="GET", body=None, ctype="application/json"):
    """-> (status, parsed JSON). Error statuses return, not raise."""
    data = None
    if body is not None:
        data = body if isinstance(body, bytes) else json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


# ------------------------------------------------------------------- tests


def test_health_and_model_info(served):
    status, health = call(served["url"] + "/healthz")
    assert status == 200 and health["status"] == "ok"
    status, info = call(served["url"] + "/v1/model")
    assert status == 200
    assert info["backend"] == "checkpoint"
    assert info["variant"] == "euclidean_static"
    assert info["seg_len"] == 12


def test_score_windows_json_matches_library(served):
    rng = np.random.default_rng(0)
    windows = rng.normal(size=(9, 3, 12, 18)).astype(np.float32)
    status, resp = call(served["url"] + "/v1/score/windows", "POST",
                        {"windows": windows.tolist()})
    assert status == 200
    expected = served["scorer"].score_windows(windows)
    np.testing.assert_allclose(resp["scores"], expected, rtol=0, atol=1e-6)


def test_score_windows_npy_body_and_raw_mode(served):
    rng = np.random.default_rng(1)
    raw = (rng.normal(size=(5, 12, 17, 3)) * 50 + 200).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, raw)
    status, resp = call(served["url"] + "/v1/score/windows?raw=1", "POST",
                        buf.getvalue(), ctype="application/x-npy")
    assert status == 200
    expected = served["scorer"].score_windows(
        served["scorer"].preprocess_windows(raw))
    np.testing.assert_allclose(resp["scores"], expected, rtol=0, atol=1e-6)


def test_score_clip_matches_library(served):
    body = open(served["clip_json"], "rb").read()
    status, resp = call(served["url"] + "/v1/score/clip?n_frames=64", "POST",
                        body)
    assert status == 200
    expected = served["scorer"].score_clip_json(served["clip_json"],
                                                n_frames=64)
    np.testing.assert_allclose(resp["scores"], expected, rtol=0, atol=1e-6)


def test_stream_lifecycle_equals_offline(served):
    url = served["url"]
    status, resp = call(url + "/v1/streams", "POST", {"min_batch": 64})
    assert status == 200
    sid = resp["stream_id"]

    clip = json.load(open(served["clip_json"]))
    by_frame = {}
    for pid, traj in clip.items():
        for fk, entry in traj.items():
            kp = np.asarray(entry["keypoints"], np.float64).reshape(-1, 3)
            by_frame.setdefault(int(fk), {})[int(pid)] = kp
    frames = [{"frame": fk,
               "poses": {str(pid): kp.tolist()
                         for pid, kp in by_frame[fk].items()}}
              for fk in sorted(by_frame)]
    # Split the clip across two requests: session state must carry over.
    mid = len(frames) // 2
    for chunk in (frames[:mid], frames[mid:]):
        status, resp = call(url + f"/v1/streams/{sid}/frames", "POST",
                            {"frames": chunk})
        assert status == 200 and resp["applied"] == len(chunk)

    status, prov = call(url + f"/v1/streams/{sid}/scores?smooth=0")
    assert status == 200 and prov["n_frames"] > 0

    status, final = call(url + f"/v1/streams/{sid}/flush?n_frames=64", "POST")
    assert status == 200
    expected = served["scorer"].score_clip_json(served["clip_json"],
                                                n_frames=64)
    np.testing.assert_allclose(final["scores"], expected, rtol=0, atol=1e-6)

    # flush closes the session
    status, resp = call(url + f"/v1/streams/{sid}/scores")
    assert status == 404


def test_error_mapping(served):
    url = served["url"]
    status, resp = call(url + "/v1/nope")
    assert status == 404
    status, resp = call(url + "/v1/score/windows", "POST", {"wrong": 1})
    assert status == 400 and "windows" in resp["error"]
    status, resp = call(url + "/v1/score/windows", "POST",
                        {"windows": [[1.0, 2.0]]})
    assert status == 400 and "4-D" in resp["error"]

    # bad frame key: 400, earlier frames still applied, stream retryable
    _, resp = call(url + "/v1/streams", "POST")
    sid = resp["stream_id"]
    kp = np.zeros((17, 3)).tolist()
    frames = [{"frame": 5, "poses": {"1": kp}},
              {"frame": 5, "poses": {"1": kp}}]
    status, resp = call(url + f"/v1/streams/{sid}/frames", "POST",
                        {"frames": frames})
    assert status == 400 and "strictly increasing" in resp["error"]
    assert "1 earlier frames" in resp["error"]

    # stream limit (max_streams=2; one is live from above)
    _, resp = call(url + "/v1/streams", "POST")
    sid2 = resp["stream_id"]
    status, resp = call(url + "/v1/streams", "POST")
    assert status == 429
    for s in (sid, sid2):
        status, _ = call(url + f"/v1/streams/{s}", "DELETE")
        assert status == 200
    status, _ = call(url + f"/v1/streams/{sid}", "DELETE")
    assert status == 404


def test_keepalive_survives_unread_body_responses(served):
    """ADVICE r4 (medium): an error response sent before the request body
    was read (unknown-route 404 with a POST body, oversized-body 400) must
    not leave the unread bytes on the persistent connection — they would be
    parsed as the next request line. The server closes such connections."""
    import http.client

    host, port = served["url"].replace("http://", "").split(":")
    # Baseline: two good requests on ONE keep-alive connection.
    conn = http.client.HTTPConnection(host, int(port))
    try:
        body = json.dumps(
            {"windows": np.zeros((2, 3, 12, 18)).tolist()}).encode()
        for _ in range(2):
            conn.request("POST", "/v1/score/windows", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()
        # 404 with a body the handler never reads: response must carry
        # Connection: close (stream would otherwise be misaligned).
        conn.request("POST", "/v1/nope", b'{"x": 1}',
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 404
        assert resp.getheader("Connection", "").lower() == "close"
        resp.read()
    finally:
        conn.close()

    # Oversized Content-Length: 400 + close, and the connection cannot be
    # corrupted by the never-sent/never-read body bytes.
    conn = http.client.HTTPConnection(host, int(port))
    try:
        conn.putrequest("POST", "/v1/score/windows")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(10**12))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert resp.getheader("Connection", "").lower() == "close"
    finally:
        conn.close()


def test_nonfinite_scores_yield_valid_json_500(served):
    """ADVICE r4: NaN scores must not leak bare NaN tokens (invalid JSON);
    the response is a clean 500 that strict clients can parse."""
    buf = io.BytesIO()
    bad = np.full((3, 3, 12, 18), np.nan, np.float32)
    np.save(buf, bad)
    status, resp = call(served["url"] + "/v1/score/windows", "POST",
                        buf.getvalue(), ctype="application/x-npy")
    assert status == 500
    assert "non-finite" in resp["error"]


def test_malformed_clip_json_is_400_not_404(served, monkeypatch):
    """ADVICE r4: a KeyError escaping library code (e.g. clip JSON missing
    'keypoints') is malformed input -> 400 'missing key', not 'not found';
    only the dedicated UnknownStream type maps to 404."""
    # Natural malformed-clip path: a mid-trajectory frame with a wrong
    # payload is rejected as 400 (never 404) with a parseable message.
    kp = [1.0, 2.0, 0.9] * 17
    traj = {f"{f:04d}": {"keypoints": kp} for f in range(1, 15)}
    traj["0007"] = {"notkeypoints": kp}
    body = json.dumps({"1": traj}).encode()
    status, resp = call(served["url"] + "/v1/score/clip", "POST", body)
    assert status == 400 and "error" in resp

    # The mapping itself: a KeyError raised from library code must surface
    # as 400 'missing key', not be swallowed by the old KeyError->404 rule.
    from coskad_tpu.serve import AnomalyScorer

    def boom(self, *a, **k):
        raise KeyError("keypoints")

    monkeypatch.setattr(AnomalyScorer, "score_clip_json", boom)
    status, resp = call(served["url"] + "/v1/score/clip", "POST", body)
    assert status == 400
    assert "missing key" in resp["error"] and "keypoints" in resp["error"]


def test_artifact_backend_scores_without_model_code(served, tmp_path):
    from coskad_tpu.export_hlo import export_scorer, load_artifact
    from coskad_tpu.http_server import ScoringService, build_server

    artifact = str(tmp_path / "scorer.zip")
    export_scorer(served["scorer"], artifact, platforms=("cpu",))
    service = ScoringService(artifact=load_artifact(artifact),
                             source=artifact)
    server = build_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, info = call(url + "/v1/model")
        assert status == 200 and info["backend"] == "artifact"

        rng = np.random.default_rng(2)
        windows = rng.normal(size=(7, 3, 12, 18)).astype(np.float32)
        status, resp = call(url + "/v1/score/windows", "POST",
                            {"windows": windows.tolist()})
        assert status == 200
        expected = service.artifact.score_windows(windows)
        np.testing.assert_allclose(resp["scores"], expected, rtol=0,
                                   atol=1e-6)

        # preprocessing-dependent routes are explicit 501s, not crashes
        status, resp = call(url + "/v1/score/windows?raw=1", "POST",
                            {"windows": windows.tolist(), "raw": True})
        assert status == 501
        status, resp = call(url + "/v1/streams", "POST")
        assert status == 501
        status, resp = call(url + "/v1/score/clip", "POST", b"{}",
                            ctype="application/json")
        assert status == 501
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
