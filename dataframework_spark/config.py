"""Config layer: validation, defaults, broadcast semantics, path templates.

This is the reference's "session & catalog" surface (SURVEY.md §2.8,
C2–C11) re-expressed as a plain-Python layer in front of Spark readers:

* defaults merge                    — ``tools.py:49-55``   (C7)
* outer+element type validation     — ``tools.py:30-39``   (C8)
* scalar/list/dict config broadcast — ``preprocess.py:212-242,435-466`` (C4;
  the reference implements it twice — once here, shared)
* ``{key}`` path-template decode    — ``tools.py:109-131`` (S5)
* format/extension normalization    — ``preprocess.py:428-433`` (S6)
* anti-projection of dict keys      — ``tools.py:42-46``   (P5)
* scalar↔collection coercion        — ``tools.py:16-27``   (C9; ``totuple``
  is dead code in the reference and is not ported)
* load-config decode (name/name_map/root/format/range/labeled)
                                    — ``preprocess.py:319-372`` (C2)
* process-config decode (cv/train/extend/center)
                                    — ``preprocess.py:196-210`` (C3)
* train normalization               — ``preprocess.py:272-278`` (C6)

Documented divergences (intended semantics kept, SURVEY.md §7):

* errors raise :class:`ConfigError` instead of ``sys.exit(-1)``
  (``tools.py:89-91``) — a library must never kill the process;
* warnings go through :mod:`warnings`, not stdout prints (``tools.py:87``);
* long-format DataFrames need explicit column names, so the load config
  gains ``key``/``label``/``features`` keys (the reference's implicit
  class-index labels, ``preprocess.py:59,61``, have no columnar analogue).
"""

from __future__ import annotations

import copy
import re
import warnings
from collections.abc import Iterable
from typing import Any

#: dict-broadcast fallback key (reference ``predefine.py:4``).
DEFAULT_KEY_NAME = "default"

#: Reference ``DEFAULT_LOAD_DATABASE_CONFIG`` (``predefine.py:6-15``),
#: retargeted from ``done_{name}.mat`` to columnar parquet.
DEFAULT_LOAD_DATABASE_CONFIG: dict[str, Any] = {
    "root": ".",
    "format": "{name}.parquet",
    "range": [-1, -1],  # 1-based inclusive class range; [-1,-1] = all
    "labeled": False,  # True → last feature element is the label
    "key": "vec_id",
    "label": "label",
    "features": "embedding",
    "columns": None,  # optional projection pushed to the scan (S1/P1)
}

#: Reference ``DEFAULT_PREPROCESS_DATA_CONFIG`` (``predefine.py:17-22``).
DEFAULT_PREPROCESS_DATA_CONFIG: dict[str, Any] = {
    "cv": 5,
    "train": -1,
    "extend": False,
    "center": False,
}


class ConfigError(ValueError):
    """Typed replacement for the reference's print-and-``sys.exit(-1)``."""


def config_warning(msg: str) -> None:
    warnings.warn(msg, UserWarning, stacklevel=3)


# ---------------------------------------------------------------------------
# C7 / C8 / C9 / P5 — generic helpers
# ---------------------------------------------------------------------------


def set_default_config(config: dict, defaults: dict) -> dict:
    """Merge ``defaults`` under ``config`` without mutating either (C7)."""
    out = dict(defaults)
    out.update(config)
    return out


def check_item_type(key: str, value: Any, spec: dict[str, tuple]) -> None:
    """Validate ``value`` against ``spec[key] = (outer_types, element_types)``
    (C8).  ``element_types=None`` skips element checks."""
    if key not in spec:
        return
    outer, elems = spec[key]
    if not isinstance(value, outer):
        raise ConfigError(
            f"config key {key!r}: expected {tuple(t.__name__ for t in outer)}, "
            f"got {type(value).__name__}"
        )
    if elems is not None and isinstance(value, (list, tuple)):
        for v in value:
            if not isinstance(v, elems):
                raise ConfigError(
                    f"config key {key!r}: element {v!r} is not "
                    f"{tuple(t.__name__ for t in elems)}"
                )


def tolist(value: Any) -> list:
    """Scalar → singleton list; iterable (non-str/dict) → list (C9)."""
    if isinstance(value, (str, bytes, dict)) or not isinstance(value, Iterable):
        return [value]
    return list(value)


def remove_dict_items(d: dict, keys: Iterable[str]) -> dict:
    """Anti-projection: drop named keys, non-mutating (P5)."""
    drop = set(keys)
    return {k: v for k, v in d.items() if k not in drop}


# ---------------------------------------------------------------------------
# C4 — scalar / positional-list / dict-with-default broadcast
# ---------------------------------------------------------------------------


def match_and_fill(value: Any, names: list[str], key: str = "?") -> dict[str, Any]:
    """Broadcast one config value across databases (C4,
    ``preprocess.py:435-466``).

    Reference semantics, restored exactly in r2:

    * scalar **and tuple** → every database gets the value; a tuple is ONE
      broadcast value (multiple train settings per db), never split
      positionally (``preprocess.py:438-439`` wraps tuple as ``[item]``);
    * list → length must be 1 or ``len(names)``
      (``preprocess.py:460-461``): a singleton broadcasts its element to
      all databases (deep-copied per database so entries never alias,
      ``preprocess.py:464``), a full-length list maps positionally;
    * dict → by database name with a ``'default'`` fallback, unknown
      names warned (``preprocess.py:451-455``).
    """
    if isinstance(value, dict):
        unknown = [k for k in value if k not in names and k != DEFAULT_KEY_NAME]
        if unknown:
            config_warning(f"config key {key!r}: unknown database names {unknown} ignored")
        if any(n not in value for n in names) and DEFAULT_KEY_NAME not in value:
            missing = [n for n in names if n not in value]
            raise ConfigError(
                f"config key {key!r}: no value for {missing} and no "
                f"{DEFAULT_KEY_NAME!r} fallback"
            )
        return {n: value.get(n, value.get(DEFAULT_KEY_NAME)) for n in names}
    if isinstance(value, list):
        if len(value) not in (1, len(names)):
            raise ConfigError(
                f"config key {key!r}: list length {len(value)} is neither 1 "
                f"nor the database count {len(names)}"
            )
        if len(value) == 1:
            return {n: copy.deepcopy(value[0]) for n in names}
        return dict(zip(names, value))
    # scalars AND tuples broadcast whole (tuple = one multi-setting value)
    return {n: value for n in names}


# ---------------------------------------------------------------------------
# S5 / S6 — path templates
# ---------------------------------------------------------------------------

_PLACEHOLDER = re.compile(r"\{(\w+)\}")


def decode_path_template(template: str, mapping: dict[str, Any]) -> str:
    """``{key}`` substitution from config values (S5, ``tools.py:109-131``);
    unresolved placeholders are an error, not silent passthrough."""
    def sub(m: re.Match) -> str:
        k = m.group(1)
        if k not in mapping:
            raise ConfigError(f"path template {template!r}: no value for {{{k}}}")
        return str(mapping[k])

    return _PLACEHOLDER.sub(sub, template)


def normalize_format_item(fmt: str, extension: str = "parquet") -> str:
    """Ensure the filename template ends with ``.{extension}``,
    case-insensitively (S6, ``preprocess.py:428-433``)."""
    if re.search(rf"\.{extension}$", fmt, flags=re.IGNORECASE):
        return re.sub(rf"\.{extension}$", f".{extension}", fmt, flags=re.IGNORECASE)
    return f"{fmt}.{extension}"


# ---------------------------------------------------------------------------
# C2 — load-config decode → per-database scan specs (S3)
# ---------------------------------------------------------------------------

_LOAD_SPEC: dict[str, tuple] = {
    "root": ((str,), None),
    "format": ((str,), None),
    "range": ((list, tuple), (int,)),
    "labeled": ((bool,), None),
    "key": ((str,), None),
    "label": ((str,), None),
    "features": ((str,), None),
}


def decode_load_config(config: dict) -> dict[str, dict[str, Any]]:
    """Validate/normalize the database config into per-database scan specs
    (C2 + S3, ``preprocess.py:319-388``): required ``name``, optional
    ``name_map`` renaming, broadcast of every other key, template-decoded
    path."""
    if "name" not in config:
        raise ConfigError('database config requires a "name" key')
    names = [str(n) for n in tolist(config["name"])]
    if not names:
        raise ConfigError('"name" must list at least one database')

    name_map = config.get("name_map") or {}
    if not isinstance(name_map, dict):
        raise ConfigError('"name_map" must be a dict of {name: alias}')
    aliases = {n: str(name_map.get(n, n)) for n in names}

    cfg = set_default_config(
        remove_dict_items(config, ("name", "name_map")), DEFAULT_LOAD_DATABASE_CONFIG
    )
    per_db: dict[str, dict[str, Any]] = {}
    broadcast = {
        k: match_and_fill(cfg[k], names, k)
        for k in ("root", "format", "labeled", "key", "label", "features")
    }
    # "columns" is list-valued like "range": a flat list/tuple of column
    # names applies to EVERY database (the common intent); per-database
    # column sets use a dict or list-of-lists (C4 rules apply).
    cols_val = cfg["columns"]
    if (
        isinstance(cols_val, (list, tuple))
        and cols_val
        and all(isinstance(c, str) for c in cols_val)
    ):
        broadcast["columns"] = {n: list(cols_val) for n in names}
    else:
        broadcast["columns"] = match_and_fill(cols_val, names, "columns")
    # "range" is itself list-valued, so broadcast is ambiguous: a flat
    # [lo, hi] int pair applies to every database (the reference's common
    # case, ``predefine.py:11``); a list of pairs matches positionally; a
    # dict matches by name.
    rng_val = cfg["range"]
    if (
        isinstance(rng_val, (list, tuple))
        and len(rng_val) == 2
        and all(isinstance(x, int) and not isinstance(x, bool) for x in rng_val)
    ):
        broadcast["range"] = {n: list(rng_val) for n in names}
    else:
        broadcast["range"] = match_and_fill(rng_val, names, "range")
    for n in names:
        for k in _LOAD_SPEC:
            check_item_type(k, broadcast[k][n], _LOAD_SPEC)
        rng = list(broadcast["range"][n])
        if len(rng) != 2:
            raise ConfigError(f'"range" for {n!r} must be [lo, hi], got {rng}')
        fmt = normalize_format_item(str(broadcast["format"][n]))
        path_vars = {"name": aliases[n], "root": broadcast["root"][n]}
        filename = decode_path_template(fmt, path_vars)
        per_db[n] = {
            "alias": aliases[n],
            "path": f"{broadcast['root'][n].rstrip('/')}/{filename}",
            "range": rng,
            "labeled": bool(broadcast["labeled"][n]),
            "key": broadcast["key"][n],
            "label": broadcast["label"][n],
            "features": broadcast["features"][n],
            "columns": broadcast["columns"][n],
        }
    return per_db


# ---------------------------------------------------------------------------
# C3 / C6 — process-config decode
# ---------------------------------------------------------------------------

_PROCESS_SPEC: dict[str, tuple] = {
    "cv": ((int,), None),
    "extend": ((bool,), None),
    "center": ((bool,), None),
}


def adapt_train_item(value: Any) -> tuple:
    """Normalize ``train`` to a tuple of settings (C6,
    ``preprocess.py:272-278``); each setting is -1, a fraction, or an int."""
    settings = tuple(value) if isinstance(value, (list, tuple)) else (value,)
    for s in settings:
        ok = s == -1 or (isinstance(s, float) and 0 < s < 1) or (
            isinstance(s, int) and not isinstance(s, bool) and s >= 1
        )
        if not ok:
            raise ConfigError(
                f'"train" setting {s!r} must be -1, a fraction in (0,1), or an int >= 1'
            )
    return settings


def decode_process_config(config: dict, names: list[str]) -> dict[str, dict[str, Any]]:
    """Validate/normalize cv/train/extend/center per database (C3,
    ``preprocess.py:196-210``), with full C4 broadcast semantics."""
    cfg = set_default_config(config, DEFAULT_PREPROCESS_DATA_CONFIG)
    out: dict[str, dict[str, Any]] = {n: {} for n in names}
    for k in ("cv", "train", "extend", "center"):
        for n, v in match_and_fill(cfg[k], names, k).items():
            if k == "train":
                out[n][k] = adapt_train_item(v)
            else:
                check_item_type(k, v, _PROCESS_SPEC)
                out[n][k] = v
    for n in names:
        if out[n]["cv"] < 1:
            raise ConfigError(f'"cv" for {n!r} must be >= 1')
    return out
