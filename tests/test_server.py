"""HTTP serving front: real requests through ThreadingHTTPServer +
BatchingEngine + the wrapper (tiny model), including inline base64 audio
and error paths."""

import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import pytest

from mellow_tpu.io.tokenizer import ByteTokenizer
from mellow_tpu.models import mellow as jmellow
from mellow_tpu.server import MellowServer
from mellow_tpu.wrapper import MellowWrapper
from tests.test_wrapper import SMALL

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"


@pytest.fixture(scope="module")
def server_url():
    params = jmellow.init_params(jax.random.PRNGKey(0), SMALL)
    wrapper = MellowWrapper(
        "test_small", "v0", 0, params=params, tokenizer=ByteTokenizer()
    )
    srv = MellowServer(wrapper, max_batch_size=4, max_wait_ms=20)
    httpd = srv.make_http_server("127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", wrapper, srv
    httpd.shutdown()
    srv.shutdown()


def _post(url, body, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def test_healthz_and_metrics(server_url):
    url, _, _ = server_url
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        assert isinstance(json.loads(r.read()), dict)


def test_generate_matches_direct(server_url):
    url, wrapper, _ = server_url
    status, out = _post(
        url + "/generate",
        {"audio1": REF_WAV1, "audio2": REF_WAV2, "prompt": "hello",
         "max_len": 4},
    )
    assert status == 200
    direct = wrapper.generate(
        [[REF_WAV1, REF_WAV2, "hello"]], max_len=4, top_p=0.8, temperature=1.0
    )[0]
    assert out["text"] == direct


def test_generate_inline_base64_audio(server_url):
    url, _, _ = server_url
    wav = base64.b64encode(open(REF_WAV1, "rb").read()).decode()
    status, out = _post(
        url + "/generate",
        {"audio1_b64": wav, "audio2": REF_WAV1, "prompt": "x", "max_len": 3},
    )
    assert status == 200 and isinstance(out["text"], str)


def test_error_paths(server_url):
    url, _, _ = server_url
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/generate", {"prompt": "no audio"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/generate", {"audio1": "/nope.wav", "audio2": REF_WAV1,
                                  "prompt": "x"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/nope", {})
    assert e.value.code == 404


def test_tmp_wavs_cleaned_after_request(server_url):
    """Inline-b64 temp wavs are deleted once the request resolves."""
    import os

    url, _, srv = server_url
    wav = base64.b64encode(open(REF_WAV1, "rb").read()).decode()
    status, _ = _post(
        url + "/generate",
        {"audio1_b64": wav, "audio2_b64": wav, "prompt": "y", "max_len": 3},
    )
    assert status == 200
    assert os.listdir(srv._tmpdir) == []


def test_oversized_body_rejected_413(server_url):
    url, _, srv = server_url
    old = srv.max_body_bytes
    srv.max_body_bytes = 100
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/generate",
                  {"audio1": REF_WAV1, "audio2": REF_WAV2,
                   "prompt": "x" * 200})
        assert e.value.code == 413
    finally:
        srv.max_body_bytes = old


def test_audio_root_allowlist():
    """Paths outside audio_root -> PermissionError (403 over HTTP); errors
    never echo the probed path (no existence oracle)."""
    srv = MellowServer(object(), audio_root="/root/reference/resource")
    try:
        with pytest.raises(PermissionError) as e:
            srv.handle_generate(
                {"audio1": "/etc/passwd", "audio2": REF_WAV2, "prompt": "x"}
            )
        assert "/etc/passwd" not in str(e.value)
        # Traversal inside the root does not escape it.
        with pytest.raises(PermissionError):
            srv.handle_generate(
                {"audio1": "/root/reference/resource/../../../etc/passwd",
                 "audio2": REF_WAV2, "prompt": "x"})
        # Missing file under the root: FileNotFoundError without the path.
        with pytest.raises(FileNotFoundError) as e:
            srv.handle_generate(
                {"audio1": "/root/reference/resource/nope.wav",
                 "audio2": REF_WAV2, "prompt": "x"})
        assert "nope" not in str(e.value)
    finally:
        srv.shutdown()


def test_non_loopback_requires_audio_root():
    srv = MellowServer(object())
    srv._loopback = False  # as make_http_server sets for a public bind
    try:
        with pytest.raises(PermissionError):
            srv.handle_generate(
                {"audio1": REF_WAV1, "audio2": REF_WAV2, "prompt": "x"}
            )
    finally:
        srv.shutdown()


def test_generate_stream_sse(server_url):
    """The /generate_stream endpoint emits SSE events per flush window,
    final one marked done, with the same text as /generate."""
    url, wrapper, srv = server_url
    body = {
        "audio1": REF_WAV1, "audio2": REF_WAV2,
        "prompt": "caption", "max_len": 6,
    }
    req = urllib.request.Request(
        url + "/generate_stream",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        events = []
        for raw in resp:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events and events[-1]["done"] is True
    assert all(not e["done"] for e in events[:-1])
    code, direct = _post(url + "/generate", body)
    assert code == 200
    assert events[-1]["text"] == direct["text"]


def test_generate_stream_is_incremental(server_url):
    """Events are written as windows are produced, not in one final burst.

    A stub generate_stream blocks before its last window; the client must
    receive the first SSE event while the stub is still blocked (the old
    ``[first, *events]`` handler drained the whole generator first, so
    this read would have timed out)."""
    url, wrapper, srv = server_url
    gate = threading.Event()
    produced = []

    def fake_stream(examples, **kw):
        yield ["a"]
        yield ["ab"]  # handler emits the event for "a" after this window
        produced.append("pre-gate")
        gate.wait(timeout=60)
        yield ["abc"]

    real = srv.wrapper
    srv.wrapper = type("W", (), {"generate_stream": staticmethod(fake_stream)})()
    try:
        body = {"audio1": REF_WAV1, "audio2": REF_WAV2, "prompt": "x"}
        req = urllib.request.Request(
            url + "/generate_stream",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            line = resp.readline().decode().strip()
            while not line.startswith("data: "):
                line = resp.readline().decode().strip()
            first = json.loads(line[len("data: "):])
            assert first == {"text": "a", "done": False}
            assert not gate.is_set()  # producer still blocked -> incremental
            gate.set()
            rest = [
                json.loads(l[len("data: "):])
                for l in (r.decode().strip() for r in resp)
                if l.startswith("data: ")
            ]
        assert rest[-1] == {"text": "abc", "done": True}
    finally:
        gate.set()
        srv.wrapper = real


def test_generate_stream_error_before_sse(server_url):
    url, wrapper, srv = server_url
    body = {"audio1": "/nonexistent.wav", "audio2": REF_WAV2, "prompt": "x"}
    try:
        urllib.request.urlopen(
            urllib.request.Request(
                url + "/generate_stream",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code == 400
