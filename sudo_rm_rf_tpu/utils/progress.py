"""Progress display helper (`sudo_rm_rf/utils/progress_display.py:37-55`).

A map with a progress bar; uses tqdm when importable, else a plain loop.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Sequence


def progress_bar_wrapper(func: Callable, items: Sequence, message: str = "") -> List:
    try:
        from tqdm import tqdm

        iterator = tqdm(items, desc=message or None)
    except Exception:
        if message:
            print(message)
        iterator = items
    return [func(x) for x in iterator]
