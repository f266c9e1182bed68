"""Optional-dependency guards (mirror of reference
``src/graphnet/utilities/imports.py:9-63``)."""

from __future__ import annotations

from functools import wraps
from typing import Any, Callable


def has_icecube_package() -> bool:
    """True iff the proprietary IceTray software stack is importable."""
    try:
        import icecube  # noqa: F401

        return True
    except ImportError:
        return False


def has_jax_package() -> bool:
    try:
        import jax  # noqa: F401

        return True
    except ImportError:
        return False


def has_torch_package() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


def requires_icecube(fn: Callable) -> Callable:
    """Decorator raising a clear error when IceTray is unavailable."""

    @wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        if not has_icecube_package():
            raise ImportError(
                f"{fn.__name__} requires the IceCube software stack "
                "(icetray), which is not installed."
            )
        return fn(*args, **kwargs)

    return wrapper
