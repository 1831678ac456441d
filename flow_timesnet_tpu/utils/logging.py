"""Console logging helpers (rich if available, plain stdout otherwise)."""

from __future__ import annotations

import re
from typing import Any, Mapping

_console = None
_MARKUP = re.compile(r"\[/?[a-z ]+\]")


class _PlainConsole:
    def print(self, *args: Any, **kwargs: Any) -> None:
        text = " ".join(str(a) for a in args)
        print(_MARKUP.sub("", text))


def console():
    global _console
    if _console is None:
        try:
            from rich.console import Console

            _console = Console()
        except Exception:
            _console = _PlainConsole()
    return _console


def print_config(cfg: Mapping[str, Any], current_lr: float | None = None) -> None:
    import yaml

    console().print("[bold]Configuration[/bold]")
    console().print(yaml.safe_dump(_jsonable(cfg), sort_keys=False, allow_unicode=True))
    if current_lr is not None:
        console().print(f"[bold]Initial learning rate:[/bold] {current_lr:.6g}")


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    return obj
