"""Import the reference kaolin (pure-torch CPU paths only) for parity tests.

The reference at /root/reference has unbuilt CUDA extensions and several
optional deps missing in this image (warp, pygltflib, usd-core, plyfile,
wget). This shim stubs them so the pure-torch modules (camera, marching
tetrahedra, FlexiCubes, batch ops, ...) import and run on CPU, giving golden
oracles for parity tests. Stubbed paths raise if actually called.

Usage::

    from tests.reference_shim import import_reference_kaolin
    kaolin = import_reference_kaolin()   # None if unavailable
"""

import importlib.abc
import importlib.machinery
import sys
import types

_REFERENCE_PATH = "/root/reference"


class _RaisingNS:
    """Permissive stub: attribute access and calls return further stubs so
    import-time constant construction succeeds; any real use fails loudly
    downstream."""

    def __init__(self, name):
        self._name = name

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _RaisingNS(f"{self._name}.{k}")

    def __call__(self, *a, **k):
        return _RaisingNS(f"{self._name}()")

    def __repr__(self):
        return f"<reference stub {self._name}>"


def _fake_module(name):
    m = types.ModuleType(name)
    m.__file__ = "<stub>"
    m.__path__ = []  # behave as a package so arbitrary submodules resolve

    def _getattr(k, _n=name):
        if k.startswith("__"):
            raise AttributeError(k)
        return _RaisingNS(f"{_n}.{k}")

    m.__getattr__ = _getattr
    sys.modules[name] = m
    return m


_STUB_ROOTS = ("wget", "warp", "pygltflib", "plyfile", "pxr", "torchvision")


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _fake_module(spec.name)

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Meta-path finder that fabricates any submodule of a stubbed root."""

    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".")[0]
        if root in _STUB_ROOTS and root in sys.modules and \
                getattr(sys.modules[root], "__file__", None) == "<stub>":
            return importlib.machinery.ModuleSpec(fullname, _StubLoader(),
                                                  is_package=True)
        return None


def _install_stubs():
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.append(_StubFinder())
    if "wget" not in sys.modules:
        _fake_module("wget")

    # warp: decorators must be pass-through so @wp.kernel defs import
    if "warp" not in sys.modules:
        wp = _fake_module("warp")

        def _passthrough_decorator(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        wp.kernel = _passthrough_decorator
        wp.func = _passthrough_decorator
        wp.struct = _passthrough_decorator
        wp.init = lambda: None
        wp.constant = lambda x: x
        wp.__path__ = []  # mark as package so warp.* submodules resolve
        for sub in ("warp.sparse", "warp.optim", "warp.optim.linear",
                    "warp.utils", "warp.types", "warp.context", "warp.fem",
                    "warp.fem.cache", "warp.sim", "warp.torch"):
            _fake_module(sub)

    for mod in ("pygltflib", "plyfile", "pxr", "usd_pixar", "torchvision"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                _fake_module(mod)

    if "kaolin._C" not in sys.modules:
        fake_c = types.ModuleType("kaolin._C")
        for ns in ("ops", "metrics", "render"):
            setattr(fake_c, ns, _RaisingNS(f"kaolin._C.{ns}"))
        sys.modules["kaolin._C"] = fake_c


_kaolin = None
_attempted = False


def import_reference_kaolin():
    """Returns the reference kaolin module, or None if import fails."""
    global _kaolin, _attempted
    if _attempted:
        return _kaolin
    _attempted = True
    _install_stubs()
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    try:
        import kaolin  # noqa: F401
        _kaolin = kaolin
    except Exception as e:  # pragma: no cover
        print(f"reference kaolin unavailable: {e}")
        _kaolin = None
    return _kaolin
