"""VLM model worker: image/video requests over the same worker protocol.

Counterpart of the reference's multimodal worker path
(``tinychat/serve/model_worker_new.py:258-336``): requests carry a
``images`` list of base64-encoded files alongside the prompt, the worker
decodes them, validates the ``<image>`` placeholder count, preprocesses
to the vision tower's resolution/normalization, and streams the
generation. Same controller registration/heartbeat/NUL-delimited JSON
protocol as the text worker (serve/worker.py).

Supports all three VLM stacks:
- ``llava`` — CLIP/SigLIP tower + splice (``models/vlm.py::vlm_stream``)
- ``nvila`` — dynamic-S2 media dict (``models/nvila.py::nvila_generate``)
- ``internvl`` — dynamic tiles (``models/internvl.py::internvl_generate``)
"""

from __future__ import annotations

import base64
import io
from typing import Iterator, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from awq_tpu.config import GenConfig
from awq_tpu.serve.worker import ModelWorker

IMAGE_TOKEN = "<image>"
VIDEO_TOKEN = "<vila/video>"

# CLIP normalization (same constants as vlm_demo.load_image and the
# reference's image processor defaults)
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_base64_image(data: str, size: int) -> np.ndarray:
    """base64 file bytes -> [H, W, 3] float32, CLIP-normalized
    (``load_image_from_base64``, ``model_worker_new.py:275``)."""
    from PIL import Image

    raw = base64.b64decode(data)
    img = Image.open(io.BytesIO(raw)).convert("RGB").resize((size, size))
    x = np.asarray(img, np.float32) / 255.0
    return (x - _MEAN) / _STD


class VLMWorker(ModelWorker):
    """Worker over a VLM instead of a text InferenceEngine."""

    def __init__(
        self,
        vlm,                          # models.vlm.VLM / nvila.NVILA / ...
        tokenizer,
        model_name: str,
        arch: str = "llava",          # llava | nvila | internvl
        controller_url: Optional[str] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        limit_concurrency: int = 1,
        max_seq_len: int = 2048,
        stop_ids: Optional[List[int]] = None,
    ):
        super().__init__(
            engine=None, model_name=model_name,
            controller_url=controller_url, host=host, port=port,
            limit_concurrency=limit_concurrency, stop_ids=stop_ids,
        )
        assert arch in ("llava", "nvila", "internvl"), arch
        self.vlm = vlm
        self.tokenizer = tokenizer
        self.arch = arch
        self.max_seq_len = max_seq_len

    # ---- media ------------------------------------------------------------

    def _image_size(self) -> int:
        vc = getattr(self.vlm, "vis_cfg", None)
        return getattr(vc, "image_size", 336)

    def _decode_media(self, p: dict):
        """Request media fields -> model inputs.

        ``images``: list of base64 files; ``videos``: list of lists of
        base64 frames (the reference's gradio layer samples video frames
        client-side, ``gradio_web_server.py:363-630``)."""
        size = self._image_size()
        images = [decode_base64_image(b, size)
                  for b in (p.get("images") or [])]
        videos = [
            np.stack([decode_base64_image(b, size) for b in frames])
            for frames in (p.get("videos") or [])
        ]
        return images, videos

    # ---- generation -------------------------------------------------------

    def generate_stream(self, p: dict) -> Iterator[dict]:
        self.queue_length += 1
        acquired = self.sem.acquire(
            timeout=float(p.get("queue_timeout", 120)))
        try:
            if not acquired:
                yield {"error_code": 1, "text": "worker busy"}
                return
            prompt = p["prompt"]
            images, videos = self._decode_media(p)
            gen = self._gen_config(p)
            stop = p.get("stop_token_ids", self.stop_ids)
            for chunk in self._stream_arch(prompt, images, videos, gen,
                                           stop):
                chunk.setdefault("error_code", 0)
                yield chunk
        except ValueError as e:
            yield {"error_code": 1, "text": str(e)}
        except Exception as e:  # mirror of model_worker_new.py:338-367
            yield {"error_code": 2, "text": f"{type(e).__name__}: {e}"}
        finally:
            if acquired:
                self.sem.release()
            self.queue_length -= 1

    def _stream_arch(self, prompt: str, images, videos, gen: GenConfig,
                     stop: Sequence[int]) -> Iterator[dict]:
        from awq_tpu.models import init_kv_cache

        if self.arch == "llava":
            if videos:
                # llava has no native video path; frames become images
                images = list(images) + [f for v in videos for f in v]
                prompt = prompt.replace(
                    VIDEO_TOKEN, IMAGE_TOKEN * sum(len(v) for v in videos))
            n_tok = prompt.count(IMAGE_TOKEN)
            if n_tok != len(images):  # model_worker_new.py:270-273
                raise ValueError(
                    f"Number of images ({len(images)}) does not match "
                    f"number of {IMAGE_TOKEN} tokens in prompt ({n_tok})")
            from awq_tpu.models.vlm import vlm_stream

            pixels = jnp.asarray(np.stack(images)) if images else None
            cache = init_kv_cache(self.vlm.llm_cfg, 1, self.max_seq_len)
            yield from vlm_stream(
                self.vlm, prompt, self.tokenizer, pixels, cache, gen,
                stop_ids=stop,
            )
            return

        # nvila / internvl: media dict {"image": [...], "video": [...]}
        media = {
            "image": [jnp.asarray(im) for im in images],
            "video": [jnp.asarray(v) for v in videos],
        }
        if self.arch == "nvila":
            from awq_tpu.models.nvila import MEDIA_TOKENS, nvila_generate

            for kind, tok in MEDIA_TOKENS.items():
                n_tok, n_med = prompt.count(tok), len(media[kind])
                if n_tok != n_med:
                    raise ValueError(
                        f"{n_med} {kind}(s) but {n_tok} {tok} tokens")
            cache = init_kv_cache(self.vlm.llm_cfg, 1, self.max_seq_len)
            out = nvila_generate(self.vlm, prompt, self.tokenizer, media,
                                 cache, gen, stop_ids=stop)
        else:
            from awq_tpu.models.internvl import internvl_generate

            cache = init_kv_cache(self.vlm.llm_cfg, 1, self.max_seq_len)
            out = internvl_generate(self.vlm, prompt, self.tokenizer,
                                    media, cache, gen, stop_ids=stop)
        yield {"text": out["text"], "ids": out.get("ids"),
               "finished": True, "timing": out.get("timing")}


def main(argv=None) -> int:
    import argparse
    import time

    ap = argparse.ArgumentParser("awq_tpu.serve.vlm_worker")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--arch", default="llava",
                    choices=["llava", "nvila", "internvl"])
    ap.add_argument("--model_name", default=None)
    ap.add_argument("--controller", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=21003)
    ap.add_argument("--max_seq_len", type=int, default=2048)
    ap.add_argument("--precision", default="W4A16",
                    choices=["W4A16", "FP16"])
    ap.add_argument("--vision_int8", action="store_true")
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from awq_tpu.config import QuantConfig
    from awq_tpu.runtime.prompts import get_stop_token_ids

    quant = (QuantConfig(w_bit=4, group_size=128)
             if args.precision == "W4A16" else None)
    if args.arch == "llava":
        from awq_tpu.models.vlm_import import import_llava_model

        vlm = import_llava_model(args.model_path, quantize=quant,
                                 vision_int8=args.vision_int8)
    elif args.arch == "nvila":
        from awq_tpu.models.nvila import import_nvila_model

        vlm = import_nvila_model(args.model_path, quantize=quant)
    else:
        from awq_tpu.models.internvl import import_internvl_model

        vlm = import_internvl_model(args.model_path, quantize=quant,
                                    vision_int8=args.vision_int8)
    tok = AutoTokenizer.from_pretrained(args.model_path, use_fast=True,
                                        trust_remote_code=True)
    w = VLMWorker(
        vlm, tok, args.model_name or args.arch, arch=args.arch,
        controller_url=args.controller, host=args.host, port=args.port,
        max_seq_len=args.max_seq_len,
        stop_ids=get_stop_token_ids(args.model_path, tok),
    )
    w.start()
    print(f"[vlm_worker] {w.url} serving '{w.model_name}' ({args.arch})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        w.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
