"""Config system: configargparse-compatible CLI surface without the
dependency.

The reference stacks three systems (SURVEY §5.6): flat ``key = value`` .conf
files (configs/ncaltech.conf), shell greps, and configargparse with
multi-alias flags (``--epochs, "--pt_epochs"``) so stage-prefixed config keys
bind onto generic argument names. This module reproduces exactly that
behavior on top of stdlib argparse:

  - ``--config FILE`` loads ``key = value`` lines (``#`` comments, blank
    lines ignored) — the same files the reference ships run unchanged.
  - every argument may declare aliases; config keys matching either the
    canonical name or any alias are applied as defaults (CLI args win).
  - unknown config keys are tolerated (configargparse's parse_known_args
    behavior) — other stages' keys simply don't bind.
"""
from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Sequence


def parse_conf_file(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


class ConfigArgumentParser:
    """Minimal configargparse stand-in with multi-alias arguments."""

    def __init__(self, description: str = ""):
        self.parser = argparse.ArgumentParser(description=description)
        self.parser.add_argument("--config", type=str, default=None,
                                 help="key = value config file")
        self._alias_map: Dict[str, str] = {}   # config key -> dest
        self._type_map: Dict[str, Any] = {}
        self._nargs_map: Dict[str, Any] = {}
        self._required: list = []              # (flag, dest) checked post-parse

    def add_argument(self, *flags: str, **kwargs):
        # flags like '--epochs', '--pt_epochs' -> canonical first
        canonical = flags[0]
        dest = kwargs.get("dest", canonical.lstrip("-").replace("-", "_"))
        # defer `required` until after config-file resolution (a required
        # value may legitimately come from the .conf, configargparse-style)
        required = kwargs.pop("required", False)
        action = self.parser.add_argument(*flags, **kwargs)
        if required:
            self._required.append((canonical, action.dest))
        for f in flags:
            self._alias_map[f.lstrip("-")] = action.dest
        self._type_map[action.dest] = kwargs.get("type", None)
        self._nargs_map[action.dest] = kwargs.get("nargs", None)
        return action

    def set_defaults(self, **kwargs):
        self.parser.set_defaults(**kwargs)

    def parse_args(self, argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
        # first pass: find --config
        pre, _ = self.parser.parse_known_args(argv)
        if pre.config:
            conf = parse_conf_file(pre.config)
            defaults = {}
            for key, raw in conf.items():
                dest = self._alias_map.get(key)
                if dest is None:
                    continue  # foreign stage's key — tolerated
                defaults[dest] = self._convert(dest, raw)
            self.parser.set_defaults(**defaults)
        args, _unknown = self.parser.parse_known_args(argv)
        for flag, dest in self._required:
            if getattr(args, dest, None) in (None, ""):
                self.parser.error(f"the following arguments are required: {flag}")
        return args

    def _convert(self, dest: str, raw: str) -> Any:
        typ = self._type_map.get(dest)
        nargs = self._nargs_map.get(dest)
        if nargs in ("+", "*") or isinstance(nargs, int):
            items = raw.replace(",", " ").split()
            return [self._convert_one(typ, t) for t in items]
        return self._convert_one(typ, raw)

    def _convert_one(self, typ, raw: str) -> Any:
        if typ is None:
            # bool flags from store_true/store_false
            if raw.lower() in ("true", "1", "yes"):
                return True
            if raw.lower() in ("false", "0", "no"):
                return False
            return raw
        if typ is bool:
            return raw.lower() in ("true", "1", "yes")
        try:
            return typ(raw)
        except (TypeError, ValueError):
            return raw


def get_config_value(path: str, key: str) -> Optional[str]:
    """Shell helper parity: grep '^key = ' file (run-pipeline.sh:10-14)."""
    return parse_conf_file(path).get(key)
