"""Loading params out of this framework's msgpack checkpoints.

Checkpoints written by `utils/checkpoint.py` are flax-serialized pytrees —
either a bare param tree or a full TrainState (params + optimizer state,
so runs resume exactly; the reference loses Adam moments on restart).
"""

from __future__ import annotations


def load_params_from_checkpoint(path: str, params_template):
    """Read a checkpoint file into the structure of ``params_template``.

    Accepts both bare-params saves and full TrainState saves (the params
    subtree is extracted).
    """
    import flax.serialization

    with open(path, "rb") as fh:
        blob = fh.read()
    try:
        return flax.serialization.from_bytes(params_template, blob)
    except Exception:
        state = flax.serialization.msgpack_restore(blob)
        return flax.serialization.from_state_dict(
            params_template, state["params"]
        )
