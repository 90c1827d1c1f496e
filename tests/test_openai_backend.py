"""OpenAI-compatible backend against a local stub server: structured-output
scoring, input-order preservation, retries, failure sentinels."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from reflectionflow_tpu.verifiers.openai_backend import OpenAICompatVerifier


class StubHandler(BaseHTTPRequestHandler):
    fail_first = 0  # fail this many requests with 500 before succeeding
    delay_for_first = 0.0
    lock = threading.Lock()
    request_count = 0

    def log_message(self, *args):
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with StubHandler.lock:
            StubHandler.request_count += 1
            n = StubHandler.request_count
        if n <= StubHandler.fail_first:
            self.send_response(500)
            self.end_headers()
            return
        # derive a deterministic "score" from the prompt text
        user_texts = [
            c["text"]
            for m in body["messages"]
            if isinstance(m.get("content"), list)
            for c in m["content"]
            if c.get("type") == "text"
        ]
        tag_text = " ".join(user_texts)
        score = sum(ord(c) for c in tag_text) % 10
        if "response_format" in body:
            schema_fields = body["response_format"]["json_schema"]["schema"]["properties"].keys()
            content = json.dumps(
                {f: {"score": score, "explanation": f"stub:{f}"} for f in schema_fields}
            )
        else:
            content = f"REPLY[{tag_text[:40]}]"
        out = {"choices": [{"message": {"content": content}}]}
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture()
def server():
    StubHandler.fail_first = 0
    StubHandler.request_count = 0
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), StubHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}/v1"
    httpd.shutdown()


def _verifier(base_url, **kw):
    return OpenAICompatVerifier(base_url=base_url, api_key="stub", max_retries=3, retry_delay_s=0.01, **kw)


def test_score_structured_and_ordered(server):
    v = _verifier(server)
    imgs = [np.zeros((4, 4, 3), np.uint8)] * 3
    prompts = ["aaa", "bbbb", "cc"]
    outs = v.score(imgs, prompts)
    assert len(outs) == 3
    assert all("overall_score" in o and "score" in o["overall_score"] for o in outs)
    # input order: score derived from prompt text must match per index
    expected = [sum(ord(c) for c in p) % 10 for p in prompts]
    got = [o["overall_score"]["score"] for o in outs]
    assert got == expected


def test_score_tag_schema(server):
    v = _verifier(server)
    outs = v.score([np.zeros((4, 4, 3), np.uint8)], ["p"], tag="counting")
    assert "count_accuracy" in outs[0]


def test_retry_then_success(server):
    StubHandler.fail_first = 2
    v = _verifier(server)
    outs = v.score([np.zeros((4, 4, 3), np.uint8)], ["p"])
    assert outs[0]["overall_score"]["score"] != float("-inf")


def test_failure_sentinel_keeps_length(server):
    StubHandler.fail_first = 10**9  # always fail
    v = _verifier(server)
    outs = v.score([np.zeros((4, 4, 3), np.uint8)] * 2, ["a", "b"])
    assert len(outs) == 2
    assert all(o["overall_score"]["score"] == float("-inf") for o in outs)


def test_refine_and_reflect(server):
    v = _verifier(server)
    imgs = [np.zeros((4, 4, 3), np.uint8)]
    refined = v.refine_prompt(imgs, ["orig"], ["current"], reflections=["r"], evaluations=["e"])
    assert refined[0].startswith("REPLY[")
    reflections = v.generate_reflections(imgs, ["orig"], ["current"])
    assert reflections[0].startswith("REPLY[")
