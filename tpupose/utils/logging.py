"""Rank-0 colored logging kit.

Capability parity with the reference's logging utilities
(reference: HPE/utils/deco.py:5-53, HPE/utils/color.py,
pose/pose/utils/__init__.py:10-74): colored printS/printE/printW/printT/printM,
a `master_only` decorator, a banner decorator, and a timing decorator.

TPU-native twist: "master" is `jax.process_index() == 0` (the MASTER_RANK /
env-RANK analog); works before and after distributed init.
"""

from __future__ import annotations

import functools
import sys
import time
import traceback


class _C:
    RED = "\033[91m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    BLUE = "\033[94m"
    MAGENTA = "\033[95m"
    CYAN = "\033[96m"
    BOLD = "\033[1m"
    END = "\033[0m"


def is_master() -> bool:
    """True on process 0 (single-process always true)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def master_only(fn):
    """Run `fn` only on the master process (reference: HPE/utils/deco.py:10-15)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_master():
            return fn(*args, **kwargs)
        return None

    return wrapper


def _emit(tag: str, color: str, *args, file=None):
    if not is_master():
        return
    msg = " ".join(str(a) for a in args)
    print(f"{color}{_C.BOLD}[{tag}]{_C.END}{color} {msg}{_C.END}", file=file or sys.stdout)


def printS(*args):
    """Success (green)."""
    _emit("SUCCESS", _C.GREEN, *args)


def printE(*args):
    """Error (red) + traceback if inside an exception handler
    (reference: HPE/utils/deco.py printE includes traceback)."""
    _emit("ERROR", _C.RED, *args, file=sys.stderr)
    if is_master() and sys.exc_info()[0] is not None:
        traceback.print_exc()


def printW(*args):
    """Warning (yellow)."""
    _emit("WARNING", _C.YELLOW, *args)


def printT(*args):
    """Trace/info (cyan)."""
    _emit("TRACE", _C.CYAN, *args)


def printM(*args):
    """Milestone/message (magenta)."""
    _emit("MESSAGE", _C.MAGENTA, *args)


def line(title: str = ""):
    """Banner decorator: prints a separator line around a call
    (reference: HPE/utils/deco.py `line`)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if is_master():
                bar = "=" * 60
                print(f"{_C.BLUE}{bar}{_C.END}")
                if title:
                    print(f"{_C.BLUE}{_C.BOLD}{title:^60}{_C.END}")
                    print(f"{_C.BLUE}{bar}{_C.END}")
            out = fn(*args, **kwargs)
            if is_master():
                print(f"{_C.BLUE}{'=' * 60}{_C.END}")
            return out

        return wrapper

    return deco


def time_check(fn):
    """Wall-clock timing decorator (reference: HPE/utils/deco.py:45-53)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        dt = time.perf_counter() - t0
        printT(f"{fn.__name__} took {dt:.4f}s")
        return out

    return wrapper


class FileLogger:
    """Append-only persistent training log (the log.txt epoch lines of the
    reference, HPE/engine/trainer.py:32-38). Master-only, timestamped,
    flushed per line so tails survive crashes."""

    def __init__(self, path: str):
        self.path = path
        if is_master():
            import os

            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, text: str):
        if not is_master():
            return
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(self.path, "a") as f:
            f.write(f"[{stamp}] {text}\n")
