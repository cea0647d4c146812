"""Training data pipeline (reference: train_utils.py:35-274).

Host-side, framework-free: latents are pre-encoded once through the AE and
cached (the reference caches on CPU per file, train_utils.py:133-194), then
batches are zero-padded numpy with boolean masks. Batches are padded to
shape buckets so the jitted train step compiles once per bucket.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from echo_tts_tpu.core.config import AEConfig
from echo_tts_tpu.models.pca import PCAState
from echo_tts_tpu.pipeline.audio_io import load_audio
from echo_tts_tpu.pipeline.speaker import ae_encode, get_speaker_latent_and_mask
from echo_tts_tpu.pipeline.tokenizer import get_text_input_ids_and_mask

import jax.numpy as jnp


@dataclasses.dataclass
class TrainingSample:
    """reference: train_utils.py:35-41."""

    audio_path: str
    text: str
    speaker_audio_path: Optional[str] = None  # None -> same file as speaker ref


class EchoTTSDataset:
    """Pre-encoding dataset (reference: train_utils.py:86-238): target audio
    -> 80-d latents; speaker ref = first 30 s of the (same) file."""

    def __init__(
        self,
        samples: List[TrainingSample],
        ae_params: dict,
        ae_cfg: AEConfig,
        pca: PCAState,
        max_latent_length: Optional[int] = None,
        speaker_max_duration: float = 30.0,
        io_workers: int = 2,
    ):
        """io_workers > 0 overlaps host audio decode (native resampler /
        libmpg123 — echo_tts_tpu.native) with the device AE encode of the
        previous file: decode jobs run on a thread pool with a bounded
        in-flight window while the main thread feeds the encoder. The
        reference pre-encodes serially (train_utils.py:133-194). 0 = serial.
        """
        from concurrent.futures import ThreadPoolExecutor

        self.samples = samples
        self.max_latent_length = max_latent_length
        self.latent_cache: Dict[str, np.ndarray] = {}
        self.speaker_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}

        # distinct decode jobs, in deterministic first-appearance order
        lat_paths, spk_paths = [], []
        for s in samples:
            if s.audio_path not in self.latent_cache:
                self.latent_cache[s.audio_path] = None
                lat_paths.append(s.audio_path)
            sp = s.speaker_audio_path or s.audio_path
            if sp not in self.speaker_cache:
                self.speaker_cache[sp] = None
                spk_paths.append(sp)

        jobs = ([("lat", p, lambda p=p: load_audio(p)) for p in lat_paths]
                + [("spk", p, lambda p=p: load_audio(
                    p, max_duration=speaker_max_duration)) for p in spk_paths])

        def encode(kind, path, audio):
            if kind == "lat":
                if max_latent_length is not None:
                    audio = audio[:, : max_latent_length * ae_cfg.frame_length]
                lat = np.asarray(ae_encode(ae_params, ae_cfg, pca,
                                           jnp.asarray(audio[None])))
                if max_latent_length is not None:
                    lat = lat[:, :max_latent_length]
                self.latent_cache[path] = lat[0]
            else:
                slat, smask = get_speaker_latent_and_mask(
                    ae_params, ae_cfg, pca, audio)
                self.speaker_cache[path] = (slat[0], smask[0])

        if io_workers <= 0:
            for kind, path, decode in jobs:
                encode(kind, path, decode())
        else:
            window = 2 * io_workers  # bounded in-flight decodes (memory cap)
            with ThreadPoolExecutor(io_workers) as ex:
                pending = []
                for kind, path, decode in jobs:
                    pending.append((kind, path, ex.submit(decode)))
                    if len(pending) >= window:
                        k, p, fut = pending.pop(0)
                        encode(k, p, fut.result())
                for k, p, fut in pending:
                    encode(k, p, fut.result())

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict:
        s = self.samples[idx]
        sp = s.speaker_audio_path or s.audio_path
        slat, smask = self.speaker_cache[sp]
        return {"latent": self.latent_cache[s.audio_path], "text": s.text,
                "speaker_latent": slat, "speaker_mask": smask}


def _bucket(n: int, granularity: int = 64) -> int:
    return max(granularity, -(-n // granularity) * granularity)


def collate(items: List[dict], max_text_length: int = 768,
            bucket_granularity: int = 64) -> Dict[str, np.ndarray]:
    """Zero-pad + mask collate (reference: train_utils.py:241-274), with
    bucket-rounded lengths for compile stability."""
    d = items[0]["latent"].shape[-1]
    t_max = _bucket(max(i["latent"].shape[0] for i in items), bucket_granularity)
    s_max = _bucket(max(i["speaker_latent"].shape[0] for i in items),
                    bucket_granularity)
    n = len(items)

    latents = np.zeros((n, t_max, d), np.float32)
    latent_mask = np.zeros((n, t_max), bool)
    spk = np.zeros((n, s_max, d), np.float32)
    spk_mask = np.zeros((n, s_max), bool)
    for i, it in enumerate(items):
        tl = it["latent"].shape[0]
        latents[i, :tl] = it["latent"]
        latent_mask[i, :tl] = True
        sl = it["speaker_latent"].shape[0]
        spk[i, :sl] = it["speaker_latent"]
        spk_mask[i, :sl] = it["speaker_mask"]

    ids, text_mask, _ = get_text_input_ids_and_mask(
        [it["text"] for it in items], max_length=max_text_length, normalize=False)

    return {"latent": latents, "latent_mask": latent_mask,
            "text_input_ids": ids, "text_mask": text_mask,
            "speaker_latent": spk, "speaker_mask": spk_mask}


def batches(dataset: EchoTTSDataset, batch_size: int, rng: np.random.Generator,
            **collate_kw):
    """Shuffled epoch iterator."""
    order = rng.permutation(len(dataset))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        yield collate([dataset[j] for j in order[i : i + batch_size]], **collate_kw)


def batches_prefetch(dataset: EchoTTSDataset, batch_size: int,
                     rng: np.random.Generator, prefetch: int = 2,
                     **collate_kw):
    """`batches` with a producer thread: the next `prefetch` collated batches
    are built while the device runs the current train step (host collate +
    tokenize off the step's critical path — the input-pipeline half of the
    weak-scaling story, SURVEY.md §7.3 item 6). Identical batch sequence to
    `batches` for the same rng state."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    _END = object()
    stop = threading.Event()

    from echo_tts_tpu.utils.queues import drain, put_until_abandoned

    def _put(item) -> bool:
        # bounded put that gives up when the consumer is gone: without the
        # stop check an abandoned generator (exception in the epoch loop)
        # would leave this thread blocked on a full queue forever, pinning
        # collated batches in memory
        return put_until_abandoned(q, item, stop)

    def produce():
        try:
            for b in batches(dataset, batch_size, rng, **collate_kw):
                if not _put(b):
                    return
            _put(_END)
        except BaseException as e:  # surface producer errors to the consumer
            _put(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        drain(q)  # unblock a producer mid-put
        t.join(timeout=5)


AUDIO_EXTENSIONS = (".wav", ".mp3", ".flac", ".ogg", ".m4a")


def prepare_samples_from_directory(
    audio_dir: str,
    transcriptions: Optional[Dict[str, str]] = None,
    extensions: Tuple[str, ...] = AUDIO_EXTENSIONS,
    transcribe_missing: bool = False,
    asr=None,
) -> List[TrainingSample]:
    """Scan a directory for audio and attach transcriptions (reference:
    train_utils.py:811-854). With `transcribe_missing`, files without a
    provided transcription are run through ASR (reference transcribes
    everything up-front; here it is opt-in for zero-egress environments)."""
    files: List[Path] = []
    for ext in extensions:
        files.extend(Path(audio_dir).glob(f"*{ext}"))
        files.extend(Path(audio_dir).glob(f"*{ext.upper()}"))
    paths = sorted(str(p) for p in set(files))
    texts = dict(transcriptions or {})
    if transcribe_missing:
        missing = [p for p in paths if p not in texts]
        if missing:
            texts.update(transcribe_audio_files(missing, asr=asr))
    return [TrainingSample(audio_path=p, text=texts[p])
            for p in paths if texts.get(p)]


def _tag_transcript(text: str) -> str:
    """Prepend the `[S1]` speaker tag the tokenizer expects (reference:
    train_utils.py:609-612; mirrors the tokenizer auto-tag rule)."""
    text = text.strip()
    if text and not text.startswith("[") and "S1" not in text:
        text = "[S1] " + text
    return text


def _default_asr(model_name: str):
    """Build a transformers ASR pipeline (zero-egress environments need the
    weights pre-downloaded)."""
    from transformers import pipeline as hf_pipeline  # pragma: no cover

    return hf_pipeline("automatic-speech-recognition", model=model_name)  # pragma: no cover


def _call_asr(asr, path: str, language: Optional[str]) -> str:
    """Invoke an ASR callable, forwarding `language` only when it is accepted
    (the reference passes it to whisper's transcribe, train_utils.py:572;
    Parakeet ignores it, train_utils.py:642). Injected test/offline callables
    that only take a path keep working."""
    if language is not None:
        try:
            import inspect

            sig = inspect.signature(asr)
            accepts = ("language" in sig.parameters
                       or any(p.kind == inspect.Parameter.VAR_KEYWORD
                              for p in sig.parameters.values()))
        except (TypeError, ValueError):  # builtins / C callables
            accepts = False
        if accepts:
            return asr(path, language=language)["text"]
    return asr(path)["text"]


def transcribe_audio(audio_path: str, model_name: str = "openai/whisper-base",
                     language: Optional[str] = "en", asr=None) -> str:
    """Single-file Whisper transcription (reference: train_utils.py:550-580).
    `asr` is an injectable callable path -> {"text": ...} for tests/offline;
    `language` is forwarded when the callable accepts it."""
    asr = asr or _default_asr(model_name)
    return _tag_transcript(_call_asr(asr, audio_path, language))


def transcribe_audio_files(audio_paths: List[str], model_name: str = "openai/whisper-base",
                           language: Optional[str] = "en", asr=None,
                           on_error: str = "collect",
                           progress_every: int = 0) -> Dict[str, str]:
    """Batch ASR (reference: train_utils.py:582-620). Per-file errors are
    collected and skipped (`on_error="collect"`, the reference behavior at
    train_utils.py:715-733) or re-raised (`on_error="raise"`).
    `progress_every` > 0 logs progress every N files."""
    import logging

    log_ = logging.getLogger("echo_tts_tpu.train")
    asr = asr or _default_asr(model_name)
    out: Dict[str, str] = {}
    errors: Dict[str, str] = {}
    for i, p in enumerate(audio_paths):
        try:
            text = _tag_transcript(_call_asr(asr, p, language))
            if text:
                out[p] = text
        except Exception as e:
            if on_error == "raise":
                raise
            errors[p] = str(e)
        if progress_every > 0 and ((i + 1) % progress_every == 0
                                   or i + 1 == len(audio_paths)):
            log_.info("transcribed %d/%d files", i + 1, len(audio_paths))
    if errors:
        log_.warning(
            "transcription failed for %d file(s): %s", len(errors),
            ", ".join(sorted(errors)))
    return out


def transcribe_audio_files_parakeet(audio_paths: List[str],
                                    model_name: str = "nvidia/parakeet-ctc-1.1b",
                                    language: Optional[str] = None,
                                    batch_size: int = 8,
                                    asr=None) -> Dict[str, str]:
    """Parakeet variant (reference: train_utils.py:625-734) — same
    transformers pipeline surface, different default checkpoint. Mirroring
    the reference: `language` is ignored (Parakeet auto-detects,
    train_utils.py:642) and `batch_size` is the progress-update cadence
    (train_utils.py:643, 724-725), not a device batch."""
    return transcribe_audio_files(audio_paths, model_name=model_name,
                                  language=None, asr=asr,
                                  progress_every=batch_size)


def transcribe_audio_files_parallel(audio_paths: List[str],
                                    model_name: str = "openai/whisper-base",
                                    language: Optional[str] = "en",
                                    asr=None, num_workers: int = 4) -> Dict[str, str]:
    """Thread-parallel batch ASR (reference: train_utils.py:786-803). ASR
    decode is host-side and IO/compute-mixed; threads overlap file decode with
    model calls."""
    from concurrent.futures import ThreadPoolExecutor

    asr = asr or _default_asr(model_name)
    out: Dict[str, str] = {}

    def one(p):
        try:
            return p, _tag_transcript(_call_asr(asr, p, language))
        except Exception as e:
            import logging

            logging.getLogger("echo_tts_tpu.train").warning(
                "transcription failed for %s: %s", p, e)
            return p, ""

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        for p, text in ex.map(one, audio_paths):
            if text:
                out[p] = text
    return out
