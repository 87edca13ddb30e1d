"""Serving API tests: Embedder bucketing + HTTP endpoints."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from egovlp_tpu.data.text import WordPieceTokenizer
from egovlp_tpu.serving import Embedder, serve

from tests.test_readers import make_video
from tests.test_train_eval import RES, tiny_model, vocab_file  # noqa: F401


@pytest.fixture()
def embedder(tiny_model, vocab_file):  # noqa: F811
    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    return Embedder(model, params, tok, num_frames=4, input_res=RES,
                    pre_size=RES, buckets=(1, 2, 4))


def test_embed_texts_bucketed(embedder):
    out = embedder.embed_texts(["a", "b", "c"])  # bucket 4, sliced to 3
    assert out.shape == (3, 8)
    # same texts, different batch sizes -> identical embeddings (padding
    # cannot leak into real rows)
    single = embedder.embed_texts(["a"])
    np.testing.assert_allclose(out[0], single[0], atol=1e-5)


def test_embed_frames_and_videos(embedder, tmp_path):
    frames = np.random.default_rng(0).integers(
        0, 255, (3, 4, RES, RES, 3)).astype(np.uint8)
    out = embedder.embed_frames(frames)
    assert out.shape == (3, 8)

    vid = make_video(tmp_path / "v.mp4", n_frames=30, size=(RES, RES))
    out2 = embedder.embed_videos([vid])
    assert out2.shape == (1, 8)


def test_aot_export_round_trip(embedder, tiny_model, vocab_file, tmp_path):  # noqa: F811
    """jax.export artifact (io/export.py): deserialized StableHLO programs
    reproduce the live Embedder bit-for-bit through the whole bucketing
    contract (pad -> frozen program -> slice)."""
    from egovlp_tpu.io.export import ExportedEmbedder, export_embedder

    model, params = tiny_model
    path = str(tmp_path / "embedder.zip")
    manifest = export_embedder(model, params, path, num_frames=4,
                               input_res=RES, pre_size=RES, max_length=8,
                               buckets=(1, 2, 4))
    assert manifest["buckets"] == [1, 2, 4]

    tok = WordPieceTokenizer(vocab_file, max_length=8)
    aot = ExportedEmbedder(path, params, tok)

    texts = ["a person does thing", "query opt", "c"]
    np.testing.assert_allclose(aot.embed_texts(texts),
                               embedder.embed_texts(texts), atol=1e-6)

    frames = np.random.default_rng(0).integers(
        0, 255, (3, 4, RES, RES, 3)).astype(np.uint8)
    np.testing.assert_allclose(aot.embed_frames(frames),
                               embedder.embed_frames(frames), atol=1e-6)

    # over the largest bucket -> explicit error (the live Embedder grows;
    # an AOT artifact is fixed by construction)
    with pytest.raises(ValueError, match="bucket"):
        aot.embed_texts(["x"] * 5)

    # the artifact serves over HTTP exactly like the live embedder
    server = serve(aot, port=0, block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed_text",
            data=json.dumps({"texts": ["a person does thing"]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        np.testing.assert_allclose(
            np.asarray(out["embeddings"]),
            embedder.embed_texts(["a person does thing"]), atol=1e-6)
    finally:
        server.shutdown()


def test_http_server(embedder):
    server = serve(embedder, port=0, block=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            assert json.loads(r.read())["status"] == "ok"

        out = post("/embed_text", {"texts": ["a person does thing"]})
        assert len(out["embeddings"]) == 1
        assert len(out["embeddings"][0]) == 8

        # malformed request -> clean 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/embed_text", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
