"""Vision inputs processors: chat text + images -> token ids + pixel values.

Reference parity: mistralrs-core/src/vision_models/*_inputs_processor.rs and
pipeline/processing.rs `MessagesAction::FlattenOnlyText` — each model family
expands its image placeholder into the right number of image tokens and
preprocesses pixels the way its HF processor does.
"""

from __future__ import annotations

import base64
import io
import math
import os
from typing import Any

import numpy as np
from PIL import Image

from mistralrs_tpu.vision import transforms as T
from mistralrs_tpu.vision.llava import LlavaVision, anyres_grid_shape, unpad_image

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def decode_image(source: Any, *, allow_local_files: bool = True) -> Image.Image:
    """PIL image | numpy | base64/data-url string -> PIL (ref
    chat_completion.rs image fetch/base64 :153-338; no URL fetch here).

    allow_local_files: local paths / file:// URLs are a Python-API
    convenience only. The HTTP server decodes client images with
    allow_local_files=False (server/openai.py) so a remote client cannot
    read arbitrary server files by sending a path as image_url."""
    if isinstance(source, Image.Image):
        return source
    if isinstance(source, np.ndarray):
        return Image.fromarray(source)
    if isinstance(source, (bytes, bytearray)):
        return Image.open(io.BytesIO(source))
    if isinstance(source, str):
        if source.startswith("data:"):
            return Image.open(io.BytesIO(base64.b64decode(source.split(",", 1)[1])))
        if source.startswith("file://"):
            if not allow_local_files:
                raise ValueError("file:// image sources are not allowed here")
            return Image.open(source[len("file://"):])
        if allow_local_files and os.path.exists(source):
            return Image.open(source)
        try:
            return Image.open(io.BytesIO(base64.b64decode(source, validate=True)))
        except Exception as e:
            raise ValueError(
                "image source is neither a data: URL nor valid base64"
                + ("" if allow_local_files else
                   " (local file paths are not allowed over the API)")
            ) from e
    raise ValueError(f"unsupported image source: {type(source)}")


class LlavaProcessor:
    """<image> -> side^2 image tokens; CLIP-style square preprocessing
    (ref llava_inputs_processor.rs)."""

    def __init__(self, tokenizer, image_token_id: int, image_size: int,
                 patch_size: int, image_token: str = "<image>",
                 mean=OPENAI_MEAN, std=OPENAI_STD):
        self.tok = tokenizer
        self.image_token = image_token
        self.image_token_id = image_token_id
        self.image_size = image_size
        self.patch_size = patch_size
        self.mean, self.std = mean, std

    @property
    def tokens_per_image(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def preprocess_image(self, img: Image.Image) -> dict:
        h, w = T.get_resize_image_size(img.height, img.width, self.image_size)
        resized = T.interpolate_resize(img, (h, w))
        x = T.to_tensor(resized)
        top, left = (h - self.image_size) // 2, (w - self.image_size) // 2
        x = x[:, top : top + self.image_size, left : left + self.image_size]
        x = T.normalize(x, self.mean, self.std)
        return {"pixel_values": x, "orig_hw": (img.height, img.width)}

    def __call__(self, text: str, images: list) -> tuple[list[int], list[dict]]:
        pixel = [self.preprocess_image(decode_image(im)) for im in images]
        parts = text.split(self.image_token)
        if len(parts) - 1 != len(images):
            raise ValueError(
                f"prompt has {len(parts) - 1} {self.image_token!r} but "
                f"{len(images)} images"
            )
        ids: list[int] = self.tok.encode(parts[0])
        for i, part in enumerate(parts[1:]):
            ids.extend([self.image_token_id] * self._tokens_for(pixel[i]))
            ids.extend(self.tok.encode(part, add_special_tokens=False))
        return ids, pixel

    def _tokens_for(self, im: dict) -> int:
        return self.tokens_per_image


class LlavaNextProcessor(LlavaProcessor):
    """Anyres tiling: base tile + grid tiles + newline separators
    (ref llava_next_inputs_processor.rs)."""

    def __init__(self, tokenizer, image_token_id: int, vision: LlavaVision,
                 image_token: str = "<image>", mean=OPENAI_MEAN, std=OPENAI_STD):
        super().__init__(tokenizer, image_token_id, vision.vcfg.image_size,
                         vision.vcfg.patch_size, image_token, mean, std)
        self.vision = vision

    def preprocess_image(self, img: Image.Image) -> dict:
        size = self.image_size
        orig_hw = (img.height, img.width)
        from mistralrs_tpu.vision.llava import select_best_resolution

        bh, bw = select_best_resolution(orig_hw, self.vision.grid_pinpoints)
        # aspect-preserving resize, centered pad to (bh, bw) (HF _resize_for_patching)
        scale = min(bw / img.width, bh / img.height)
        nh, nw = int(img.height * scale), int(img.width * scale)
        resized = T.to_tensor(T.interpolate_resize(img, (nh, nw)))
        canvas = np.zeros((3, bh, bw), np.float32)
        top, left = (bh - nh) // 2, (bw - nw) // 2
        canvas[:, top : top + nh, left : left + nw] = resized
        tiles = [
            canvas[:, y : y + size, x : x + size]
            for y in range(0, bh, size)
            for x in range(0, bw, size)
        ]
        # base image: plain square resize
        base = T.to_tensor(T.interpolate_resize(img, (size, size)))
        px = np.stack([base] + tiles)  # [n_tiles, 3, S, S]
        mean = np.asarray(self.mean, np.float32).reshape(1, 3, 1, 1)
        std = np.asarray(self.std, np.float32).reshape(1, 3, 1, 1)
        px = (px - mean) / std
        return {"pixel_values": px, "orig_hw": orig_hw}

    def _tokens_for(self, im: dict) -> int:
        side = self.image_size // self.patch_size
        gh, gw = anyres_grid_shape(im["orig_hw"], self.vision.grid_pinpoints,
                                   self.image_size)
        import jax.numpy as jnp

        un = unpad_image(jnp.zeros((1, gh * side, gw * side)), im["orig_hw"])
        h, w = un.shape[1], un.shape[2]
        newline = 1 if self.vision.image_newline is not None else 0
        return side * side + h * (w + newline)


class Idefics2Processor:
    """Expand <image> into n_latents image tokens per sub-image
    (ref idefics2_input_processor.rs; with do_image_splitting the image
    becomes 4 quadrant crops + the full image = 5 sub-images, :250-259)."""

    def __init__(self, tokenizer, image_token_id: int, n_latents: int,
                 image_size: int = 224, image_token: str = "<image>",
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
                 do_image_splitting: bool = False):
        self.tok = tokenizer
        self.image_token = image_token
        self.image_token_id = image_token_id
        self.n_latents = n_latents
        self.image_size = image_size
        self.mean, self.std = mean, std
        self.do_image_splitting = do_image_splitting

    def _sub_images(self, img: Image.Image) -> list[Image.Image]:
        if not self.do_image_splitting:
            return [img]
        w, h = img.width, img.height
        mw, mh = w // 2, h // 2
        return [
            img.crop((0, 0, mw, mh)), img.crop((mw, 0, w, mh)),
            img.crop((0, mh, mw, h)), img.crop((mw, mh, w, h)),
            img,
        ]

    def preprocess_image(self, img: Image.Image) -> dict:
        subs = [
            T.preprocess_standard(s, (self.image_size, self.image_size),
                                  self.mean, self.std)
            for s in self._sub_images(img)
        ]
        import numpy as _np

        return {"pixel_values": _np.stack(subs), "orig_hw": (img.height, img.width)}

    def tokens_per_image(self) -> int:
        return self.n_latents * (5 if self.do_image_splitting else 1)

    def __call__(self, text: str, images: list) -> tuple[list[int], list[dict]]:
        pixel = [self.preprocess_image(decode_image(im)) for im in images]
        parts = text.split(self.image_token)
        if len(parts) - 1 != len(images):
            raise ValueError("image count mismatch")
        ids: list[int] = self.tok.encode(parts[0])
        for part in parts[1:]:
            ids.extend([self.image_token_id] * self.tokens_per_image())
            ids.extend(self.tok.encode(part, add_special_tokens=False))
        return ids, pixel
