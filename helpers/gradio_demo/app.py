"""Interactive TTS demo — equivalent of the reference's Gradio app
(``/root/reference/helpers/gradio_demo/app.py``): description + prompt in,
audio out.

Uses Gradio when installed; otherwise falls back to a stdlib HTTP server
serving the same flow (this image has no gradio).

Usage: python helpers/gradio_demo/app.py <model_dir> [--tokenizer <dir>]
       [--port 7860]
"""

import argparse
import html
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs

from parler_tts_tpu.pipeline import ParlerTTSPipeline
from parler_tts_tpu.serving import BatchingEngine
from parler_tts_tpu.utils.audio_io import wav_bytes

DEFAULT_DESCRIPTION = (
    "A female speaker with a slightly low-pitched voice delivers her words "
    "quite expressively, in a very confined sounding environment with clear "
    "audio quality."
)

FORM = """<!doctype html><title>Parler-TTS (TPU)</title>
<h1>Parler-TTS — TPU-native</h1>
<form method="post">
<p>Description:<br><textarea name="description" rows="3" cols="80">{desc}</textarea></p>
<p>Prompt (what to say):<br><textarea name="prompt" rows="2" cols="80">{prompt}</textarea></p>
<p>Seed: <input name="seed" value="0" size="6">
   Max seconds: <input name="max_seconds" value="10" size="6">
   <input type="submit" value="Generate"></p>
</form>
{audio}
"""


def run_http(pipe: ParlerTTSPipeline, port: int, warmup: bool = False):
    # concurrent requests coalesce into batched generate calls (decode step
    # cost is nearly flat in batch on TPU — see parler_tts_tpu/serving);
    # the threading server lets requests overlap so the batcher can group them.
    # The bucket set here is exactly what warmup covers — a reachable bucket
    # outside the warm set would block the serving thread on a ~30-140 s
    # inline compile the first time a burst lands in it (round-5 review)
    engine = BatchingEngine(pipe, max_batch=64, batch_buckets=(1, 4, 16, 64),
                            length_bucket_seconds=(5.0, 10.0, 30.0))
    if warmup:
        # pre-compile EVERY reachable (batch x length) bucket program so no
        # request ever pays the cold first-request compile
        # (benchmarks/serving_bench.json); a restarted server re-loads these
        # from the persistent XLA cache
        print(f"warming up bucket programs (batch {engine.batch_buckets} x "
              f"{engine.length_bucket_seconds} s)...")
        for bucket, secs in sorted(engine.warmup().items()):
            print(f"  bucket {bucket}: {secs:.1f}s")

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/stats":
                body = json.dumps(engine.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            self._page("")

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            q = parse_qs(self.rfile.read(length).decode())
            desc = q.get("description", [DEFAULT_DESCRIPTION])[0]
            prompt = q.get("prompt", ["Hey, how are you doing today?"])[0]
            seed = int(q.get("seed", ["0"])[0])
            secs = float(q.get("max_seconds", ["10"])[0])
            if self.path == "/api":
                sr, wav = engine.tts(desc, prompt, seed=seed, max_seconds=secs)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.end_headers()
                self.wfile.write(wav_bytes(wav, sr))
                return
            sr, wav = engine.tts(desc, prompt, seed=seed, max_seconds=secs)
            import base64

            b64 = base64.b64encode(wav_bytes(wav, sr)).decode()
            audio_tag = f'<audio controls src="data:audio/wav;base64,{b64}"></audio>'
            self._page(audio_tag, desc=desc, prompt=prompt)

        def _page(self, audio_tag, desc=DEFAULT_DESCRIPTION, prompt="Hey, how are you doing today?"):
            body = FORM.format(desc=html.escape(desc), prompt=html.escape(prompt), audio=audio_tag).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"serving on http://0.0.0.0:{port}  (POST /api returns raw WAV; GET /stats)")
    ThreadingHTTPServer(("0.0.0.0", port), Handler).serve_forever()


def run_gradio(pipe: ParlerTTSPipeline, port: int, warmup: bool = False):  # pragma: no cover
    import time

    import gradio as gr

    # the callback pins max_seconds so its jit signature is known up front —
    # warmup must compile the SAME (batch, max_length) program the callback
    # uses (pipeline._run keys on max_length; a warmup at a different
    # max_seconds warms nothing — round-5 review)
    callback_seconds = 10.0

    if warmup:
        # same cold-first-request mitigation as the HTTP path (ADVICE r4:
        # --warmup used to be silently ignored when gradio was installed)
        print(f"warming up the batch-1 {callback_seconds:g} s program...")
        t0 = time.monotonic()
        pipe.tts(DEFAULT_DESCRIPTION, "Warming up the server.",
                 max_seconds=callback_seconds)
        print(f"  warm in {time.monotonic() - t0:.1f}s")

    def gen(prompt, description, seed):
        sr, wavs = pipe.tts(description, prompt, seed=int(seed),
                            max_seconds=callback_seconds)
        return sr, wavs[0]

    gr.Interface(
        fn=gen,
        inputs=[gr.Text(label="Prompt"), gr.Text(label="Description", value=DEFAULT_DESCRIPTION),
                gr.Number(label="Seed", value=0)],
        outputs=gr.Audio(label="Generated audio"),
    ).launch(server_port=port)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile common bucket programs before serving")
    args = ap.parse_args()
    # pcm16: the server ships 16-bit WAV bytes, so convert on device and
    # halve the waveform device->host transfer
    pipe = ParlerTTSPipeline.from_pretrained(args.model_dir, tokenizer_name=args.tokenizer,
                                             pcm16=True)
    try:
        import gradio  # noqa: F401

        run_gradio(pipe, args.port, warmup=args.warmup)
    except ImportError:
        run_http(pipe, args.port, warmup=args.warmup)


if __name__ == "__main__":
    sys.exit(main())
