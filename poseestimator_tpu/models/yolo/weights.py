"""Import trained YOLO11-seg PyTorch weights into the flax model.

The reference runs inference with a fine-tuned ``best.pt``
(main_realsense.py:14, Detector.py:7); for drop-in parity this maps the
Ultralytics ``model.{i}.{...}`` state_dict onto the flax parameter tree of
``model.YOLO11Seg`` (whose module names mirror the layer numbering).

Accepted inputs: a raw ``state_dict`` (tensor mapping), a full Ultralytics
checkpoint dict (``{"model": nn.Module, ...}`` — unpickled with stub classes,
no ultralytics install needed), or a path to either.
Conventions handled: OIHW -> HWIO conv kernels, grouped/depthwise convs,
ConvTranspose IOHW -> HWIO, BN params vs running stats, and the constant DFL
conv (dropped — decode.py computes the expectation directly).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_np(t) -> np.ndarray:
    """Tensor/array -> float32 numpy (Ultralytics saves fp16 checkpoints;
    imported weights must not silently stay half precision)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    a = np.asarray(t)
    if np.issubdtype(a.dtype, np.floating) and a.dtype != np.float32:
        a = a.astype(np.float32)
    return a


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW (out, in/groups, kh, kw) -> flax HWIO (kh, kw, in/groups, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    with spatial flip (torch computes transposed correlation; flax
    ConvTranspose is a fractionally-strided convolution)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


_BLOCK_RULES = [
    (re.compile(r"^m\.(\d+)\."), lambda m: f"m_{m.group(1)}."),
    (re.compile(r"^ffn\.0\."), lambda m: "ffn_0."),
    (re.compile(r"^ffn\.1\."), lambda m: "ffn_1."),
]

_HEAD_SEQ = {
    "cv2": ["b0", "b1", "b2"],
    "cv4": ["m0", "m1", "m2"],
}
_HEAD_CV3 = {"0.0": "c0_0", "0.1": "c0_1", "1.0": "c1_0", "1.1": "c1_1", "2": "c2"}


def _translate_inner(rest: str) -> str:
    """Translate a within-block torch path to the flax module path."""
    out = []
    parts = rest.split(".")
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "m" and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"m_{parts[i + 1]}")
            i += 2
        elif p == "ffn" and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            out.append(f"ffn_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return ".".join(out)


def translate_key(torch_key: str) -> tuple[tuple[str, ...], str] | None:
    """torch state_dict key -> (flax module path, leaf kind) or None to skip.

    leaf kind in {conv.weight, bn.weight, bn.bias, bn.running_mean,
    bn.running_var, plain.weight, plain.bias, deconv.weight, deconv.bias}.
    """
    key = torch_key
    if key.startswith("model.model."):
        key = key[len("model."):]
    if not key.startswith("model."):
        return None
    key = key[len("model."):]
    if key.endswith("num_batches_tracked"):
        return None

    idx, rest = key.split(".", 1)
    if idx != "23":
        path = f"m{idx}." + _translate_inner(rest)
        return _leaf(path)

    # segment head
    if rest.startswith("dfl."):
        return None
    for branch in ("cv2", "cv3", "cv4"):
        pre = branch + "."
        if rest.startswith(pre):
            r = rest[len(pre):]
            level, r = r.split(".", 1)
            if branch == "cv3":
                for seq, name in _HEAD_CV3.items():
                    if r.startswith(seq + "."):
                        tail = r[len(seq) + 1:]
                        return _leaf(f"m23_cv3_{level}.{name}." + tail, plain=(name == "c2"))
                return None
            names = _HEAD_SEQ[branch]
            seq, tail = r.split(".", 1)
            name = names[int(seq)]
            return _leaf(
                f"m23_{branch}_{level}.{name}." + tail, plain=(name in ("b2", "m2"))
            )
    if rest.startswith("proto."):
        r = rest[len("proto."):]
        if r.startswith("upsample."):
            leaf = r.split(".")[-1]
            return (("m23_proto", "upsample"), f"deconv.{leaf}")
        return _leaf("m23_proto." + _translate_inner(r))
    return None


def _leaf(path: str, plain: bool = False):
    """Split '...conv.weight'-style paths into (module path, leaf kind)."""
    parts = path.split(".")
    leaf = parts[-1]
    if len(parts) >= 2 and parts[-2] == "conv" and not plain:
        return (tuple(parts[:-1]), "conv.weight")
    if len(parts) >= 2 and parts[-2] == "bn":
        return (tuple(parts[:-2]) + ("bn",), f"bn.{leaf}")
    # plain nn.Conv2d leaf (head output convs): path ends 'name.weight'
    return (tuple(parts[:-1]), f"plain.{leaf}")


def state_dict_to_variables(state_dict: Mapping[str, Any]) -> dict:
    """Build {'params': ..., 'batch_stats': ...} for YOLO11Seg.apply."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for k, v in state_dict.items():
        tr = translate_key(k)
        if tr is None:
            continue
        path, kind = tr
        w = _to_np(v)
        if kind == "conv.weight":
            put(params, path + ("kernel",), _conv_kernel(w))  # path ends in 'conv'
        elif kind == "bn.weight":
            put(params, path + ("scale",), w)
        elif kind == "bn.bias":
            put(params, path + ("bias",), w)
        elif kind == "bn.running_mean":
            put(stats, path + ("mean",), w)
        elif kind == "bn.running_var":
            put(stats, path + ("var",), w)
        elif kind == "plain.weight":
            put(params, path + ("kernel",), _conv_kernel(w))
        elif kind == "plain.bias":
            put(params, path + ("bias",), w)
        elif kind == "deconv.weight":
            put(params, path + ("kernel",), _deconv_kernel(w))
        elif kind == "deconv.bias":
            put(params, path + ("bias",), w)
    return {"params": params, "batch_stats": stats}


def _stub_torch_load(path_or_buf):
    """torch.load a full Ultralytics checkpoint without ultralytics installed:
    satisfy unpickling with stub classes (state is restored via __dict__, so
    empty nn.Module subclasses suffice to walk to .state_dict())."""
    import torch

    # torch.load with a custom pickle module that falls back to stubs
    import pickle

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                import torch.nn as nn

                return type(name, (nn.Module,), {})

    class StubPickleModule:
        Unpickler = StubUnpickler

        @staticmethod
        def load(f, **kw):
            return StubUnpickler(f).load()

    return torch.load(path_or_buf, map_location="cpu", weights_only=False,
                      pickle_module=StubPickleModule)


def load_checkpoint(source) -> dict:
    """Path / file / dict / nn.Module -> flax variables for YOLO11Seg."""
    obj = source
    if isinstance(obj, (str, bytes)) or hasattr(obj, "read"):
        obj = _stub_torch_load(obj)
    if isinstance(obj, Mapping) and "model" in obj and not _is_tensor_map(obj):
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        if hasattr(obj, "float"):
            obj = obj.float()  # Ultralytics checkpoints store fp16 modules
        obj = obj.state_dict()
    if not isinstance(obj, Mapping):
        raise TypeError(f"cannot interpret checkpoint of type {type(obj)}")
    return state_dict_to_variables(obj)


def _is_tensor_map(d) -> bool:
    return all(hasattr(v, "shape") or isinstance(v, np.ndarray) for v in d.values())


# --- inverse mapping (tests): flax variables -> ultralytics-style state_dict ---


def variables_to_state_dict(variables: dict) -> dict[str, np.ndarray]:
    """Export flax variables as an Ultralytics-style state_dict (numpy).

    Used to round-trip-test the importer; also lets externally trained
    Ultralytics runs consume weights trained here.
    """
    out: dict[str, np.ndarray] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                walk(v, path + (k,))
            else:
                out_key = _flax_path_to_torch(path + (k,), kind="param")
                if out_key:
                    out[out_key] = _export_leaf(path + (k,), np.asarray(v))

    walk(variables.get("params", {}), ())

    def walk_stats(tree, path):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                walk_stats(v, path + (k,))
            else:
                out_key = _flax_path_to_torch(path + (k,), kind="stat")
                if out_key:
                    out[out_key] = np.asarray(v)

    walk_stats(variables.get("batch_stats", {}), ())
    return out


def _export_leaf(path, w):
    leaf = path[-1]
    if leaf == "kernel":
        if path[-2] == "upsample":
            return np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    return np.ascontiguousarray(w)


_INV_HEAD_SEQ = {
    **{f"m23_cv2_{i}": ("cv2", i, {"b0": "0", "b1": "1", "b2": "2"}) for i in range(3)},
    **{f"m23_cv4_{i}": ("cv4", i, {"m0": "0", "m1": "1", "m2": "2"}) for i in range(3)},
    **{
        f"m23_cv3_{i}": (
            "cv3", i, {"c0_0": "0.0", "c0_1": "0.1", "c1_0": "1.0", "c1_1": "1.1", "c2": "2"},
        )
        for i in range(3)
    },
}


def _flax_path_to_torch(path, kind: str):
    parts = list(path)
    top = parts[0]
    leaf = parts[-1]
    if top.startswith("m23_proto"):
        inner = parts[1:]
        base = "model.23.proto." + ".".join(_inv_inner(inner[:-1]))
        return _leaf_name(base, inner, leaf, kind)
    if top in _INV_HEAD_SEQ:
        branch, level, names = _INV_HEAD_SEQ[top]
        seq = names[parts[1]]
        base = f"model.23.{branch}.{level}.{seq}"
        rest = parts[2:-1]
        if rest:
            base += "." + ".".join(_inv_inner(rest))
        return _leaf_name(base, parts[1:], leaf, kind)
    m = re.match(r"^m(\d+)$", top)
    if m:
        base = f"model.{m.group(1)}"
        rest = parts[1:-1]
        if rest:
            base += "." + ".".join(_inv_inner(rest))
        return _leaf_name(base, parts, leaf, kind)
    return None


def _inv_inner(parts):
    out = []
    for p in parts:
        mm = re.match(r"^m_(\d+)$", p)
        if mm:
            out += ["m", mm.group(1)]
        elif p == "ffn_0":
            out += ["ffn", "0"]
        elif p == "ffn_1":
            out += ["ffn", "1"]
        else:
            out.append(p)
    return out


def _leaf_name(base, parts, leaf, kind):
    if kind == "stat":
        # path ends (..., 'bn', 'mean'|'var')
        stat = {"mean": "running_mean", "var": "running_var"}[leaf]
        return f"{base}.{stat}"
    if leaf == "kernel":
        # plain conv (no bn sibling) vs ConvBNAct conv
        if base.endswith(".conv"):
            return base + ".weight"
        if base.endswith("upsample"):
            return base + ".weight"
        return base + ".weight"
    if leaf == "bias":
        return base + ".bias"
    if leaf == "scale":
        return base + ".weight"
    return None
