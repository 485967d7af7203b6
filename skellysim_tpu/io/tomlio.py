"""Minimal TOML emit/load.

Loading uses the stdlib ``tomllib``; emitting is a small serializer sufficient
for the config schema (scalars, strings, lists, nested tables, arrays of
tables) — the environment ships no TOML writer package.
"""

from __future__ import annotations

import tomllib
from typing import Any


def load(path) -> dict:
    with open(path, "rb") as f:
        return tomllib.load(f)


def loads(text: str) -> dict:
    return tomllib.loads(text)


def _fmt_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt_value(x) for x in v) + "]"
    raise TypeError(f"cannot serialize {type(v)} to TOML")


def _is_table(v) -> bool:
    return isinstance(v, dict)


def _is_table_array(v) -> bool:
    return isinstance(v, (list, tuple)) and len(v) > 0 and all(isinstance(x, dict) for x in v)


def _emit_table(d: dict, prefix: str, out: list) -> None:
    scalars = {k: v for k, v in d.items() if not _is_table(v) and not _is_table_array(v)}
    tables = {k: v for k, v in d.items() if _is_table(v)}
    arrays = {k: v for k, v in d.items() if _is_table_array(v)}
    for k, v in scalars.items():
        if v is None:
            continue
        out.append(f"{k} = {_fmt_value(v)}")
    for k, v in tables.items():
        name = f"{prefix}{k}"
        out.append("")
        out.append(f"[{name}]")
        _emit_table(v, name + ".", out)
    for k, lst in arrays.items():
        name = f"{prefix}{k}"
        for item in lst:
            out.append("")
            out.append(f"[[{name}]]")
            _emit_table(item, name + ".", out)


def dumps(d: dict) -> str:
    out: list = []
    _emit_table(d, "", out)
    return "\n".join(out) + "\n"


def dump(d: dict, path) -> None:
    with open(path, "w") as f:
        f.write(dumps(d))
