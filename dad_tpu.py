"""Ergonomic alias for the canonical (very long) package name.

``import dad_tpu`` yields the
``robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation_in_noisy_environments_tpu``
package itself (this module replaces its own entry in ``sys.modules``), and a
meta-path hook keeps submodule identity unique: ``dad_tpu.x.y`` is always the
very same module object as ``<canonical>.x.y``.
"""

import importlib
import importlib.abc
import importlib.util
import sys

_CANONICAL = (
    "robust_speech_emotion_recognition_via_dynamic_asymmetric_distillation"
    "_in_noisy_environments_tpu"
)
_ALIAS = "dad_tpu"


class _AliasFinder(importlib.abc.MetaPathFinder):
    """Redirects `dad_tpu.x.y` imports to the canonical package modules."""

    def find_module(self, fullname, path=None):  # pragma: no cover - py<3.12 shim
        return None

    def find_spec(self, fullname, path=None, target=None):
        if fullname == _ALIAS or fullname.startswith(_ALIAS + "."):
            canonical = _CANONICAL + fullname[len(_ALIAS):]
            mod = importlib.import_module(canonical)
            sys.modules[fullname] = mod
            return importlib.util.spec_from_loader(fullname, _AliasLoader(mod))
        return None


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, mod):
        self._mod = mod

    def create_module(self, spec):
        return self._mod

    def exec_module(self, module):
        pass


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())

_pkg = importlib.import_module(_CANONICAL)
sys.modules[_ALIAS] = _pkg
sys.modules[__name__] = _pkg
