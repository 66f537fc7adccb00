from __future__ import annotations

import copy
import functools
import importlib
import os
import re
import sys
from typing import Any, Callable, Iterable, Mapping

import yaml


class Config(dict):
    """A nested dict with attribute access (stand-in for OmegaConf DictConfig)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping) and not isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def to_dict(cfg: Any) -> Any:
    """Plain-dict view (for serialization/checkpointing)."""
    if isinstance(cfg, Mapping):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [to_dict(v) for v in cfg]
    return cfg


def default_config_dir() -> str:
    env = os.environ.get("MVP_CONFIG_DIR")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "configs")


class _Yaml12Loader(yaml.SafeLoader):
    """SafeLoader with YAML-1.2 float resolution: PyYAML's 1.1 resolver
    requires a '.' so ``1e-4`` parses as a STRING — OmegaConf (which this
    layer replicates) patches its loader the same way, and an lr override
    like ``probe_lr=1e-4`` must come out a float, not crash optax."""


_Yaml12Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |[-+]?\.[0-9_]+(?:[eE][-+]?[0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        data = yaml.load(f, Loader=_Yaml12Loader)
    return data or {}


def _parse_value(text: str) -> Any:
    """Parse an override value the way OmegaConf's dotlist does (YAML scalar)."""
    try:
        return yaml.load(text, Loader=_Yaml12Loader)
    except yaml.YAMLError:
        return text


def _set_path(cfg: dict, dotted: str, value: Any, allow_new: bool) -> None:
    parts = dotted.split(".")
    node = cfg
    for part in parts[:-1]:
        if part not in node or not isinstance(node[part], dict):
            if not allow_new:
                raise KeyError(
                    f"Override path '{dotted}' not in config (use +{dotted}=... to add)"
                )
            node[part] = Config()
        node = node[part]
    if parts[-1] not in node and not allow_new:
        raise KeyError(
            f"Override key '{dotted}' not in config (use +{dotted}=... to add)"
        )
    node[parts[-1]] = value


_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_interpolations(cfg: Config) -> None:
    def resolve(value: Any) -> Any:
        if isinstance(value, str):
            full = _INTERP_RE.fullmatch(value)
            if full:
                target = cfg.get_path(full.group(1))
                if target is None:
                    raise KeyError(f"Interpolation '{value}' not resolvable")
                return resolve(target)
            return _INTERP_RE.sub(
                lambda m: str(cfg.get_path(m.group(1), m.group(0))), value
            )
        return value

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            for k in list(node.keys()):
                node[k] = walk(node[k])
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve(node)

    walk(cfg)


def compose(
    config_name: str,
    overrides: Iterable[str] = (),
    config_dir: str | None = None,
) -> Config:
    """Compose an experiment config like ``hydra.compose``.

    The top-level YAML may hold a ``defaults:`` list of ``{group: name}``
    entries (plus the conventional ``_self_``); each group entry loads
    ``<config_dir>/<group>/<name>.yaml`` into ``cfg.<group>`` — matching the
    reference's layout (``configs/depth_training.yaml:9-14``). Overrides of
    the form ``group=other`` swap the group file; dotted overrides set leaf
    values; a ``+`` prefix adds new keys (reference README usage
    ``+backbone.return_multilayer=True``, ``README.md:82-88``).
    """
    config_dir = config_dir or default_config_dir()
    path = os.path.join(config_dir, config_name + ".yaml")
    top = _load_yaml(path)

    defaults = top.pop("defaults", [])
    group_choices: dict[str, str] = {}
    group_order: list[str] = []
    for entry in defaults:
        if entry == "_self_":
            continue
        if isinstance(entry, Mapping):
            ((group, name),) = entry.items()
            group_choices[str(group)] = str(name)
            group_order.append(str(group))

    dotlist: list[tuple[str, Any, bool]] = []
    for ov in overrides:
        ov = ov.strip()
        if not ov:
            continue
        allow_new = ov.startswith("+")
        body = ov[1:] if allow_new else ov
        if "=" not in body:
            raise ValueError(f"Override '{ov}' must be key=value")
        key, _, raw = body.partition("=")
        key = key.strip()
        if key in group_choices and "." not in key:
            group_choices[key] = raw.strip()
        elif (allow_new and "." not in key
              and os.path.isfile(os.path.join(config_dir, key,
                                              raw.strip() + ".yaml"))):
            # hydra '+group=name' appends a NEW group default and composes
            # its YAML — assigning the bare string would surface later as
            # a confusing instantiate() failure far from the user's typo
            group_choices[key] = raw.strip()
            group_order.append(key)
        else:
            dotlist.append((key, _parse_value(raw.strip()), allow_new))

    cfg = Config()
    for group in group_order:
        gpath = os.path.join(config_dir, group, group_choices[group] + ".yaml")
        cfg[group] = _wrap(_load_yaml(gpath))
    # _self_ merges last by default (reference configs list it last).
    _deep_merge(cfg, _wrap(top))

    for key, value, allow_new in dotlist:
        _set_path(cfg, key, _wrap(value), allow_new)

    _resolve_interpolations(cfg)
    return cfg


def _deep_merge(dst: dict, src: Mapping) -> dict:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, Mapping):
            _deep_merge(dst[k], v)
        else:
            dst[k] = copy.deepcopy(v)
    return dst


# The reference configs name torch classes (`configs/backbone/dino_b16.yaml:1`
# -> `evals.models.dino.DINO`); alias them onto this package so the original
# YAML files keep working.
_TARGET_ALIASES: dict[str, str] = {}


def register_target_alias(old: str, new: str) -> None:
    _TARGET_ALIASES[old] = new


def _locate(target: str) -> Any:
    target = _TARGET_ALIASES.get(target, target)
    if target.startswith("evals."):
        mapped = "midvision_probe_tpu.compat." + target[len("evals.") :]
        try:
            return _locate_raw(mapped)
        except Exception:
            pass
    return _locate_raw(target)


def _locate_raw(target: str) -> Any:
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ImportError(f"Cannot locate target '{target}'")
    try:
        module = importlib.import_module(module_name)
    except ImportError:
        # maybe the attr is nested (module.Class.attr)
        parent, _, cls = module_name.rpartition(".")
        module = importlib.import_module(parent)
        return getattr(getattr(module, cls), attr)
    return getattr(module, attr)


def instantiate(cfg: Any, *args: Any, **kwargs: Any) -> Any:
    """Build an object from a ``_target_`` config node (hydra.utils.instantiate).

    Nested dict values holding their own ``_target_`` are instantiated
    recursively; ``**kwargs`` override config keys (reference usage:
    ``instantiate(cfg.probe, feat_dim=model.feat_dim, max_depth=...)``,
    ``train_depth.py:564-567``).
    """
    if not isinstance(cfg, Mapping) or "_target_" not in cfg:
        raise TypeError(f"instantiate() needs a mapping with _target_, got {cfg!r}")
    target = _locate(cfg["_target_"])
    call_kwargs: dict[str, Any] = {}
    for k, v in cfg.items():
        if k.startswith("_"):
            continue
        if isinstance(v, Mapping) and "_target_" in v:
            call_kwargs[k] = instantiate(v)
        else:
            call_kwargs[k] = v
    call_kwargs.update(kwargs)
    return target(*args, **call_kwargs)


def main(config_name: str, config_dir: str | None = None) -> Callable:
    """Driver decorator replacing ``@hydra.main`` (``train_depth.py:849``).

    Parses ``sys.argv[1:]`` as overrides and calls the wrapped function with
    the composed config.
    """

    def decorator(fn: Callable[[Config], Any]) -> Callable[[], Any]:
        @functools.wraps(fn)
        def wrapper(argv: list[str] | None = None) -> Any:
            # honor an explicit JAX_PLATFORMS env (e.g. =cpu for offline
            # smokes): the axon boot shim pins jax.config.jax_platforms
            # programmatically ("axon,cpu"), so the env var alone is
            # silently ignored once jax initializes — mirror
            # convert_checkpoints.py:36-43. The shell's preset value
            # "axon" is left to the shim: pinning it verbatim would drop
            # the cpu backend that zoo._random_init and host-side eval
            # paths rely on.
            env_plat = os.environ.get("JAX_PLATFORMS")
            if env_plat and env_plat != "axon":
                import jax

                jax.config.update("jax_platforms", env_plat)
            overrides = sys.argv[1:] if argv is None else argv
            cfg = compose(config_name, overrides, config_dir)
            return fn(cfg)

        return wrapper

    return decorator
