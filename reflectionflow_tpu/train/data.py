"""GenRef-wds-compatible streaming data pipeline.

Capability parity with `ImageConditionWebDataset`
(`/root/reference/train_flux/train/data.py:27-229`) without the webdataset
dependency: a plain tarfile reader over GenRef shards whose samples are
keyed groups of files `{key}.good_image.jpg, {key}.bad_image.jpg,
{key}.reflection.txt, {key}.prompt.txt, {key}.subset.txt`.

Reproduced semantics:
  * four subset streams (general/length/rule/editing) filtered from shared
    shards, mixed with stage-scheduled ratios linearly interpolated over
    `training_stages` (data.py:85-103);
  * paired augmentation: bad resized to good, shorter-edge resize to
    target_size, SAME random crop for both, bad then resized to
    condition_size (data.py:105-125);
  * CFG-style drops: text p=0.1 -> empty prompt; image p=0.1 -> black
    condition (skipped for `editing`); reflection p=0.2 or len<5 ->
    description falls back to the prompt (data.py:159-174);
  * description = "{prompt} [Reflexion] {reflection}" (data.py:166-171);
  * infinite per-subset iterators with re-init;
  * multi-host sharding: shards split by (host_index, host_count) —
    replacing the torch.distributed `nodesplitter` (data.py:13-25).
"""

from __future__ import annotations

import io
import tarfile
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np


def _to_float(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 127.5 - 1.0


@dataclass
class Sample:
    good: np.ndarray  # (H, W, 3) uint8
    bad: np.ndarray
    prompt: str
    reflection: str
    subset: str


_FIELD_SUFFIXES = (
    "good_image.jpg", "good_image.png", "bad_image.jpg", "bad_image.png",
    "reflection.txt", "prompt.txt", "subset.txt",
)


def _split_key(base: str) -> tuple[str, str] | None:
    for suffix in _FIELD_SUFFIXES:
        if base.endswith("." + suffix):
            return base[: -(len(suffix) + 1)], suffix
    return None


def iter_tar_samples(shard_path: str) -> Iterator[Sample]:
    """Stream grouped samples out of one GenRef tar shard.

    Uses the native C++ indexer/reader (`utils.native`) when available —
    one sequential header pass + batched pread per sample group — and falls
    back to Python tarfile otherwise."""
    from ..utils import native

    if native.get_lib() is not None:
        idx = native.tar_index(shard_path)
        if idx is not None:
            yield from _iter_tar_samples_native(shard_path, idx)
            return
    yield from _iter_tar_samples_py(shard_path)


def _iter_tar_samples_native(shard_path: str, idx=None) -> Iterator[Sample]:
    from ..utils import native

    names, offsets, sizes = idx if idx is not None else native.tar_index(shard_path)
    groups: dict[str, dict[str, int]] = {}
    order: list[str] = []
    for i, name in enumerate(names):
        ks = _split_key(name.split("/")[-1])
        if ks is None:
            continue
        key, suffix = ks
        if key not in groups:
            groups[key] = {}
            order.append(key)
        groups[key][suffix] = i
    for key in order:
        members = groups[key]
        idxs = list(members.values())
        blobs = native.tar_read_batch(shard_path, offsets[idxs], sizes[idxs])
        parts = dict(zip(members.keys(), blobs))
        sample = _assemble(parts)
        if sample is not None:
            yield sample


def _iter_tar_samples_py(shard_path: str) -> Iterator[Sample]:
    with tarfile.open(shard_path, "r") as tar:
        current_key = None
        parts: dict[str, bytes] = {}
        for member in tar:
            if not member.isfile():
                continue
            name = member.name
            # {key}.{field}.{ext} — split off the sample key
            base = name.split("/")[-1]
            for suffix in ("good_image.jpg", "good_image.png", "bad_image.jpg", "bad_image.png",
                           "reflection.txt", "prompt.txt", "subset.txt"):
                if base.endswith("." + suffix):
                    key = base[: -(len(suffix) + 1)]
                    break
            else:
                continue
            if current_key is not None and key != current_key and parts:
                sample = _assemble(parts)
                if sample is not None:
                    yield sample
                parts = {}
            current_key = key
            parts[suffix] = tar.extractfile(member).read()
        if parts:
            sample = _assemble(parts)
            if sample is not None:
                yield sample


def _assemble(parts: dict[str, bytes]) -> Sample | None:
    from PIL import Image

    good_b = parts.get("good_image.jpg") or parts.get("good_image.png")
    bad_b = parts.get("bad_image.jpg") or parts.get("bad_image.png")
    if good_b is None or bad_b is None:
        return None
    try:
        good = np.asarray(Image.open(io.BytesIO(good_b)).convert("RGB"))
        bad = np.asarray(Image.open(io.BytesIO(bad_b)).convert("RGB"))
    except Exception:  # corrupt sample -> skip (wds ignore_and_continue)
        return None
    return Sample(
        good=good,
        bad=bad,
        prompt=parts.get("prompt.txt", b"").decode("utf-8", "ignore").strip(),
        reflection=parts.get("reflection.txt", b"").decode("utf-8", "ignore").strip(),
        subset=parts.get("subset.txt", b"general").decode("utf-8", "ignore").strip() or "general",
    )


def _paired_crop(good: np.ndarray, bad: np.ndarray, target: int, rng: np.random.Generator):
    """Resize bad to good's size, shorter-edge resize both to `target`,
    apply the SAME random crop, return (good_t, bad_t) each (target,target,3)."""
    from PIL import Image

    g = Image.fromarray(good)
    b = Image.fromarray(bad).resize(g.size)
    w, h = g.size
    scale = target / min(w, h)
    nw, nh = max(target, round(w * scale)), max(target, round(h * scale))
    g = g.resize((nw, nh))
    b = b.resize((nw, nh))
    x0 = int(rng.integers(0, nw - target + 1))
    y0 = int(rng.integers(0, nh - target + 1))
    box = (x0, y0, x0 + target, y0 + target)
    return np.asarray(g.crop(box)), np.asarray(b.crop(box))


@dataclass
class StageSchedule:
    """Linear interpolation of subset mix ratios over training stages.

    split_ratios: {subset: [ratio_stage0, ratio_stage1, ...]};
    training_stages: [step0, step1, ...] boundaries (config.yaml:25-31)."""

    split_ratios: dict[str, list[float]]
    training_stages: list[int]

    def ratios_at(self, step: int) -> dict[str, float]:
        stages = self.training_stages
        if not stages or len(stages) == 1:
            return {k: v[0] for k, v in self.split_ratios.items()}
        # find surrounding stage boundaries
        if step <= stages[0]:
            frac, lo = 0.0, 0
        elif step >= stages[-1]:
            frac, lo = 1.0, len(stages) - 2
        else:
            lo = max(i for i in range(len(stages) - 1) if stages[i] <= step)
            span = stages[lo + 1] - stages[lo]
            frac = (step - stages[lo]) / max(span, 1)
        out = {}
        for k, vals in self.split_ratios.items():
            v0 = vals[min(lo, len(vals) - 1)]
            v1 = vals[min(lo + 1, len(vals) - 1)]
            out[k] = v0 + (v1 - v0) * frac
        total = sum(out.values())
        return {k: v / max(total, 1e-9) for k, v in out.items()}


@dataclass
class GenRefDataset:
    shards: list[str]
    batch_size: int = 8
    target_size: int = 512
    condition_size: int = 512
    drop_text_prob: float = 0.1
    drop_image_prob: float = 0.1
    drop_reflection_prob: float = 0.2
    schedule: StageSchedule | None = None
    seed: int = 0
    host_index: int = 0
    host_count: int = 1
    step: int = 0

    def set_step(self, step: int) -> None:
        self.step = step

    def _host_shards(self) -> list[str]:
        return [s for i, s in enumerate(self.shards) if i % self.host_count == self.host_index]

    def _subset_iter(self, subset: str) -> Iterator[Sample]:
        """Infinite stream of one subset, re-opening shards forever."""
        shards = self._host_shards()
        epoch = 0
        while True:
            import zlib

            rng = np.random.Generator(np.random.PCG64([self.seed, zlib.crc32(subset.encode()) & 0xFFFF, epoch]))
            order = rng.permutation(len(shards))
            for si in order:
                for sample in iter_tar_samples(shards[si]):
                    if sample.subset == subset:
                        yield sample
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        subsets = list(self.schedule.split_ratios.keys()) if self.schedule else ["general"]
        iters = {s: self._subset_iter(s) for s in subsets}
        rng = np.random.Generator(np.random.PCG64([self.seed, self.host_index]))
        while True:
            ratios = self.schedule.ratios_at(self.step) if self.schedule else {"general": 1.0}
            names = list(ratios.keys())
            probs = np.asarray([ratios[n] for n in names])
            probs = probs / probs.sum()
            batch = []
            for _ in range(self.batch_size):
                subset = names[int(rng.choice(len(names), p=probs))]
                sample = next(iters[subset])
                batch.append(self._transform(sample, rng))
            yield self._collate(batch)

    def _transform(self, s: Sample, rng: np.random.Generator) -> dict:
        good_t, bad_t = _paired_crop(s.good, s.bad, self.target_size, rng)
        if self.condition_size != self.target_size:
            from PIL import Image

            bad_t = np.asarray(Image.fromarray(bad_t).resize((self.condition_size, self.condition_size)))
        prompt = s.prompt
        reflection = s.reflection
        if rng.random() < self.drop_text_prob:
            prompt = ""
        if rng.random() < self.drop_image_prob and s.subset != "editing":
            bad_t = np.zeros_like(bad_t)  # black condition (pixel 0 -> -1.0)
        if rng.random() < self.drop_reflection_prob or len(reflection) < 5:
            description = prompt
        else:
            description = f"{prompt} [Reflexion] {reflection}"
        return {
            "image": _to_float(good_t),
            "condition": _to_float(bad_t),
            "original_prompt": prompt,
            "description": description,
            "subset": s.subset,
        }

    @staticmethod
    def _collate(rows: list[dict]) -> dict:
        return {
            "image": np.stack([r["image"] for r in rows]),
            "condition": np.stack([r["condition"] for r in rows]),
            "original_prompt": [r["original_prompt"] for r in rows],
            "description": [r["description"] for r in rows],
            "subset": [r["subset"] for r in rows],
            "condition_type": ["cot"] * len(rows),
        }


def write_synthetic_shard(path: str, n: int = 8, size: int = 32, seed: int = 0, subsets=("general", "editing")) -> None:
    """Tiny GenRef-format shard for tests."""
    import os

    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            key = f"{i:06d}"
            fields = {
                "good_image.jpg": rng.integers(0, 255, (size, size, 3), dtype=np.uint8),
                "bad_image.jpg": rng.integers(0, 255, (size, size, 3), dtype=np.uint8),
            }
            for name, arr in fields.items():
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                info = tarfile.TarInfo(f"{key}.{name}")
                info.size = buf.getbuffer().nbytes
                buf.seek(0)
                tar.addfile(info, buf)
            for name, text in (
                ("prompt.txt", f"prompt {i}"),
                ("reflection.txt", f"make object {i} sharper and correctly colored"),
                ("subset.txt", subsets[i % len(subsets)]),
            ):
                data = text.encode()
                info = tarfile.TarInfo(f"{key}.{name}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
