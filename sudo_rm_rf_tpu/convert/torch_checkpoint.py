"""PyTorch checkpoint -> JAX param pytree conversion.

The published SuDoRM-RF checkpoints (zenodo DOI 10.5281/zenodo.6299852) are
either whole pickled ``nn.Module``s (README recipe,
`/root/reference/README.md:75-98`) or bare ``state_dict()`` saves
(`run_improved_sudormrf.py:221-227`). Because every flax module in this repo
names its params/submodules after the torch attributes, conversion is pure
renaming:

    torch ``sm.0.proj_1x1.conv.weight``
      -> flax path ``('sm_0', 'proj_1x1', 'conv', 'weight')``

(list indices are fused into the parent name with '_'). Tensor layouts are
already torch-identical (conv weights (O, I/g, K); transposed-conv weights
(I, O/g, K) — the flip/swap happens inside ops.conv_transpose1d).
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Tuple

import numpy as np


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """Map a torch state_dict key to a flax param path.

    Digit tokens (ModuleList/Sequential indices) are merged into the
    preceding token: ``a.0.b`` -> (``a_0``, ``b``).
    """
    parts: list[str] = []
    for tok in key.split("."):
        if tok.isdigit() and parts:
            parts[-1] = f"{parts[-1]}_{tok}"
        else:
            parts.append(tok)
    return tuple(parts)


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], object]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Mapping[Tuple[str, ...], object]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def state_dict_to_params(
    state_dict: Mapping[str, "object"],
    target_params: Mapping | None = None,
    *,
    ignore_unused: Iterable[str] = (),
    ignore_leaves: Iterable[str] = ("pe", "num_batches_tracked"),
    dtype=np.float32,
) -> Dict:
    """Convert a torch state_dict to a flax param tree.

    Args:
      state_dict: torch name -> tensor (torch.Tensor or numpy).
      target_params: optional param tree (e.g. from ``jax.eval_shape`` of
        ``model.init``) used to validate coverage and shapes. Torch keys with
        no counterpart raise unless their first path component is listed in
        ``ignore_unused`` (e.g. v1's dead ``ln_mask_in``, `sudormrf.py:253`).
      ignore_leaves: buffer names dropped everywhere — e.g. the sinusoidal
        positional-encoding ``pe`` buffers the attentive variants register
        (`attentive_sudormrf_v2.py:193`), recomputed on the fly here.
    Returns:
      Nested dict param tree (the contents of flax's ``params`` collection).
    """
    drop = set(ignore_leaves)
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, tensor in state_dict.items():
        if key.split(".")[-1] in drop:
            continue
        arr = np.asarray(
            tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor,
            dtype=dtype,
        )
        flat[torch_key_to_flax_path(key)] = arr

    if target_params is not None:
        want = _flatten(target_params)
        missing = sorted(set(want) - set(flat))
        if missing:
            raise ValueError(f"checkpoint is missing params: {missing[:10]}")
        extras = set(flat) - set(want)
        bad = [p for p in extras if p[0] not in set(ignore_unused)]
        if bad:
            raise ValueError(f"checkpoint has unmapped params: {sorted(bad)[:10]}")
        for p in extras:
            del flat[p]
        for path, arr in flat.items():
            want_shape = tuple(np.shape(want[path]) or getattr(want[path], "shape", ()))
            got = tuple(arr.shape)
            # torch scalar params may be (1,) vs () or vice versa
            if want_shape != got:
                if int(np.prod(got)) == int(np.prod(want_shape)):
                    flat[path] = arr.reshape(want_shape)
                else:
                    raise ValueError(
                        f"shape mismatch at {path}: checkpoint {got} vs model {want_shape}"
                    )

    return _unflatten(flat)


def params_to_state_dict(
    params: Mapping,
    target_keys: Iterable[str] | None = None,
    *,
    to_torch: bool = False,
) -> Dict[str, object]:
    """Inverse conversion: a flax param tree -> a torch state_dict.

    Lets models trained here be exported to the reference's torch ecosystem
    (the published checkpoints' format, `README.md:75-98`) — checkpoint
    interchange runs both ways.

    Args:
      target_keys: the destination torch model's ``state_dict().keys()``.
        When given, keys are mapped exactly by matching
        ``torch_key_to_flax_path`` over the targets (robust to attribute
        names that legitimately end in ``_<digit>``); params with no
        counterpart raise. Without it, a heuristic split of trailing
        ``_<digit>`` tokens back into ``.<digit>`` indices is used.
      to_torch: return ``torch.Tensor`` values instead of numpy.
    """
    import re

    flat = _flatten(params)
    out: Dict[str, np.ndarray] = {}
    if target_keys is not None:
        by_path = {torch_key_to_flax_path(k): k for k in target_keys}
        missing = sorted(set(flat) - set(by_path))
        if missing:
            raise ValueError(f"no torch key for params: {missing[:10]}")
        for path, arr in flat.items():
            out[by_path[path]] = np.asarray(arr)
    else:
        for path, arr in flat.items():
            toks: list[str] = []
            for tok in path:
                m = re.fullmatch(r"(.+?)_(\d+)", tok)
                if m:
                    toks.extend((m.group(1), m.group(2)))
                else:
                    toks.append(tok)
            out[".".join(toks)] = np.asarray(arr)

    if to_torch:
        import torch

        # copy() guarantees an owned, writable buffer (jax arrays are
        # read-only views; torch warns on from_numpy over those)
        return {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in out.items()
        }
    return out


def load_pt_file(path: str, reference_root: str | None = None):
    """Load a ``.pt`` file into a (state_dict, attrs) pair.

    Handles both bare state_dicts and whole pickled modules. Unpickling a
    whole module requires the reference package importable — pass
    ``reference_root`` to add it to sys.path (read-only use).
    """
    import torch

    if reference_root is not None:
        import sys

        if reference_root not in sys.path:
            sys.path.insert(0, reference_root)

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        return obj, {}
    # whole pickled module: recover hyperparams from attributes, per the
    # README rehydration recipe (`README.md:80-98`).
    attrs = {
        k: getattr(obj, k)
        for k in (
            "in_audio_channels",
            "out_channels",
            "in_channels",
            "num_blocks",
            "upsampling_depth",
            "enc_kernel_size",
            "enc_num_basis",
            "num_sources",
            "group_size",
        )
        if hasattr(obj, k)
    }
    # The reference's GroupCommSudoRmRf does not store group_size on the top
    # module (`groupcomm_sudormrf_v2.py:241` takes it as an arg only); its
    # blocks keep it as ``num_group`` (`:399`). Recover it from there so the
    # published GC checkpoint rehydrates with the right architecture.
    if "group_size" not in attrs and hasattr(obj, "modules"):
        for m in obj.modules():
            if hasattr(m, "num_group"):
                attrs["group_size"] = int(m.num_group)
                break
    return obj.state_dict(), attrs
