"""Tar-shard streaming reader for LAION-style datasets
(reference ddm/webdata.py:27-150, which uses the `webdataset` package —
not available here; this is a dependency-free stdlib-tarfile equivalent).

Contract matches WebdatasetReader: iterate (image, tokenized caption) pairs
from .tar shards, filter near-black images (ddm/webdata.py:17-25),
resampled infinite epochs (:93), per-process shard sharding for multi-host.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from glob import glob
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from adm_tpu.data.image_folder import resize, to_neg_one_one
from adm_tpu.nn.text_encoder import ByteTokenizer

_IMG_EXT = (".jpg", ".jpeg", ".png", ".webp")
_TXT_EXT = (".txt", ".text", ".caption")
_JSON_EXT = (".json",)


def filter_dark(img: np.ndarray, threshold: float = 0.02) -> bool:
    """Drop near-black images (reference ddm/webdata.py:17-25)."""
    return float(img.astype(np.float32).mean()) / 255.0 > threshold


class WebdatasetReader:
    def __init__(
        self,
        urls: Sequence[str] | str,
        image_size=(256, 256),
        tokenizer=None,
        context_length: int = 77,
        min_mean_brightness: float = 0.02,
        caption_key: str = "caption",
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        **kwargs,
    ):
        if isinstance(urls, str):
            urls = sorted(glob(urls)) if any(c in urls for c in "*?[") else [urls]
        self.shards: List[str] = list(urls)[process_index::process_count]
        if not self.shards:
            raise FileNotFoundError(f"no shards for {urls}")
        self.image_size = tuple(image_size)
        if tokenizer is None:
            import os

            if os.environ.get("ADM_TPU_CLIP_BPE"):
                # the reference tokenizes with CLIP BPE (ddm/webdata.py:53);
                # supply CLIP's bpe_simple_vocab_16e6.txt.gz via env
                from adm_tpu.nn.clip_tokenizer import ClipBPETokenizer

                tokenizer = ClipBPETokenizer(context_length=context_length)
            else:
                import logging

                logging.getLogger("adm_tpu").warning(
                    "no ADM_TPU_CLIP_BPE vocab set — captions use the byte "
                    "fallback tokenizer; ids will NOT match CLIP"
                )
                tokenizer = ByteTokenizer(context_length)
        self.tokenizer = tokenizer
        self.min_brightness = min_mean_brightness
        self.caption_key = caption_key
        self.rng = np.random.RandomState(seed + process_index)

    def _decode_image(self, data: bytes) -> Optional[np.ndarray]:
        # native C++ decode (bit-exact vs PIL) with PIL as the fallback;
        # any failure -> warn_and_continue semantics (ddm/webdata.py:93)
        from adm_tpu.data.native import decode_bytes

        try:
            return decode_bytes(data)
        except Exception:  # incl. PIL errors when native is unavailable
            pass
        from PIL import Image

        try:
            with Image.open(io.BytesIO(data)) as im:
                return np.asarray(im.convert("RGB"))
        except Exception:
            return None

    def _emit(self, rec: Dict[str, bytes]):
        """Build one sample from a member group, or None to skip."""
        img_data = next((rec[e] for e in _IMG_EXT if e in rec), None)
        if img_data is None:
            return None
        img = self._decode_image(img_data)
        if img is None or not filter_dark(img, self.min_brightness):
            return None
        caption = ""
        for e in _TXT_EXT:
            if e in rec:
                caption = rec[e].decode("utf-8", "ignore")
                break
        else:
            for e in _JSON_EXT:
                if e in rec:
                    try:
                        caption = json.loads(rec[e]).get(self.caption_key, "")
                    except Exception:
                        caption = ""
                    break
        img = resize(img, self.image_size)
        tokens = self.tokenizer([caption])[0]
        return {"image": to_neg_one_one(img), "cond": tokens}

    def _iter_shard(self, path: str) -> Iterator[Dict[str, np.ndarray]]:
        """STREAM the tar: a sample's members are adjacent by webdataset
        convention, so group on base-name change and keep O(sample) bytes in
        RAM instead of buffering the whole (often ~1 GB) shard."""
        cur_base: Optional[str] = None
        rec: Dict[str, bytes] = {}
        with tarfile.open(path) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                base, ext = os.path.splitext(member.name)
                if base != cur_base and cur_base is not None:
                    s = self._emit(rec)
                    if s is not None:
                        yield s
                    rec = {}
                cur_base = base
                rec[ext.lower()] = tf.extractfile(member).read()
        if cur_base is not None:
            s = self._emit(rec)
            if s is not None:
                yield s

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite resampled stream (reference .with_epoch, webdata.py:93)."""
        while True:
            order = self.rng.permutation(len(self.shards))
            for i in order:
                yield from self._iter_shard(self.shards[i])


def web_batch_iterator(reader: WebdatasetReader, batch_size: int):
    it = iter(reader)
    while True:
        items = [next(it) for _ in range(batch_size)]
        yield {
            "image": np.stack([i["image"] for i in items]).astype(np.float32),
            "cond": np.stack([i["cond"] for i in items]).astype(np.int32),
        }
