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

    # .conf keys that the REFERENCE's parsers never declared, so its
    # configargparse silently drops them (shipped confs contain them; SURVEY
    # §2.11(1) documents the undeclared-key behavior). We reproduce the drop
    # exactly — honoring them would change training vs the reference — but
    # say so once, because the conf author's intent was clearly different.
    KNOWN_DROPPED_KEYS = {
        "class_lr_decay": (
            "the reference declares --layer_decay/--class_layer_decay; "
            "'class_lr_decay' binds to neither, so layer_decay stays at its "
            "default (0.9) — reproduced for parity"),
        "pt_lr_decay": (
            "no pretraining flag by this name exists in the reference "
            "(pretrain LR follows the cosine schedule); the key never binds "
            "— reproduced for parity"),
    }

    def __init__(self, description: str = ""):
        self.parser = argparse.ArgumentParser(description=description)
        self.parser.add_argument("--config", type=str, default=None,
                                 help="key = value config file")
        self._alias_map: Dict[str, str] = {}   # config key -> dest
        self._action_map: Dict[str, Any] = {}  # config key -> argparse action
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
            self._action_map[f.lstrip("-")] = action
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
                    if key in self.KNOWN_DROPPED_KEYS:
                        print(f"note: config key '{key}' is ignored: "
                              f"{self.KNOWN_DROPPED_KEYS[key]}")
                    continue  # foreign stage's key — tolerated
                action = self._action_map.get(key)
                if action is not None and getattr(action, "nargs", None) == 0 \
                        and getattr(action, "const", None) is not None:
                    # store_true/store_false: configargparse applies the
                    # action's const only for truthy config values
                    if str(raw).lower() in ("true", "1", "yes"):
                        defaults[dest] = action.const
                    continue
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
