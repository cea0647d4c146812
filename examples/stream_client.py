#!/usr/bin/env python
"""Minimal /tts_stream client: plays back (or saves) audio as it streams.

The endpoint returns chunked raw mono PCM16 (`audio/L16`, sample rate in the
X-Sample-Rate header) — one chunk per sampled latent block, arriving before
the rest of the utterance is generated. This client writes a WAV as chunks
land; time-to-first-audio is printed.

Usage:
  python scripts/serve.py --cpu --random-tiny --port 7861   # or a real model
  python examples/stream_client.py --port 7861 --text "Hello from the stream."
"""
import argparse
import json
import time
import urllib.request
import wave


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--text", default="[S1] Streaming synthesis test.")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--block-size", type=int, default=160)
    ap.add_argument("--out", default="stream_out.wav")
    ap.add_argument("--speaker-path", default=None)
    ap.add_argument("--continuation-path", default=None)
    args = ap.parse_args()

    body = {"text": args.text, "seed": args.seed, "block_size": args.block_size}
    if args.speaker_path:
        body["speaker_path"] = args.speaker_path
    if args.continuation_path:
        body["continuation_path"] = args.continuation_path

    req = urllib.request.Request(
        f"http://{args.host}:{args.port}/tts_stream",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    resp = urllib.request.urlopen(req)
    sr = int(resp.headers["X-Sample-Rate"])

    first = None
    total = 0
    with wave.open(args.out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        while True:
            chunk = resp.read(1 << 16)  # urllib de-chunks transfer-encoding
            if not chunk:
                break
            if first is None:
                first = time.perf_counter() - t0
            w.writeframes(chunk)
            total += len(chunk) // 2
    wall = time.perf_counter() - t0
    print(f"time-to-first-audio {first:.2f}s, total {total / sr:.1f}s audio "
          f"in {wall:.2f}s -> {args.out}")


if __name__ == "__main__":
    main()
