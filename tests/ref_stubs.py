"""Functional stand-ins for native deps the reference imports.

The reference repo needs imgaug (host pad/crop) and chumpy (MANO pkl
deserialization); neither is installed here. These stubs implement the
small behavioral surface the reference actually uses so its REAL code
paths (acr/utils.py img_preprocess, mano/manolayer.py ready_arguments)
can run unmodified for parity testing. Semantics:

* imgaug: ``compute_paddings_to_reach_aspect_ratio`` returns
  (top, right, bottom, left) with the floor/ceil split (top/left floor,
  bottom/right ceil — imgaug's documented convention, the same one
  acr_tpu/pipeline/preprocess.py reproduces); ``Crop``/``Pad`` with
  ``keep_size=False`` are plain slicing / np.pad.
* chumpy: arrays with ``.r``/``.dot`` plus the few module functions
  ``ready_arguments`` touches (array/eye/vstack/concatenate/MatVecMult).
"""

from __future__ import annotations

import sys
import types

import numpy as np


# --------------------------------------------------------------- imgaug

def _compute_paddings(shape, aspect_ratio):
    h, w = shape[:2]
    pad_t = pad_r = pad_b = pad_l = 0
    current = w / h
    if current < aspect_ratio:
        diff = aspect_ratio * h - w
        pad_l = int(np.floor(diff / 2))
        pad_r = int(np.ceil(diff / 2))
    elif current > aspect_ratio:
        diff = w / aspect_ratio - h
        pad_t = int(np.floor(diff / 2))
        pad_b = int(np.ceil(diff / 2))
    return (pad_t, pad_r, pad_b, pad_l)


class _Crop:
    def __init__(self, px=(0, 0, 0, 0), keep_size=False):
        self.px = px

    def __call__(self, image=None):
        t, r, b, l = self.px
        h, w = image.shape[:2]
        return image[t:h - b if b else h, l:w - r if r else w]


class _Pad:
    def __init__(self, px=(0, 0, 0, 0), keep_size=False,
                 pad_mode="constant", pad_cval=0):
        self.px, self.cval = px, pad_cval

    def __call__(self, image=None):
        t, r, b, l = self.px
        return np.pad(image, ((t, b), (l, r), (0, 0)),
                      mode="constant", constant_values=self.cval)


class _Sequential:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, image=None):
        for f in self.fns:
            image = f(image=image)
        return image


def install_functional_imgaug():
    """Install (or upgrade an empty stub of) imgaug.augmenters in
    sys.modules; rebind into acr.utils if it was already imported."""
    root = sys.modules.setdefault("imgaug", types.ModuleType("imgaug"))
    aug = sys.modules.get("imgaug.augmenters")
    if aug is None:
        aug = types.ModuleType("imgaug.augmenters")
        sys.modules["imgaug.augmenters"] = aug
    aug.Sequential = _Sequential
    aug.Crop = _Crop
    aug.Pad = _Pad
    aug.compute_paddings_to_reach_aspect_ratio = _compute_paddings
    root.augmenters = aug
    acr_utils = sys.modules.get("acr.utils")
    if acr_utils is not None:        # names were bound at its import time
        acr_utils.iaa = aug
        acr_utils.compute_paddings_to_reach_aspect_ratio = _compute_paddings
    return aug


# --------------------------------------------------------------- chumpy

class _ChArray(np.ndarray):
    dterms = ("x",)

    @property
    def r(self):
        return np.asarray(self)

    def dot(self, other):
        return np.asarray(self) @ np.asarray(other)


def _as_ch(a):
    return np.asarray(a, np.float64).view(_ChArray)


def install_functional_chumpy():
    """Install a functional chumpy stub sufficient for the reference's
    ``ready_arguments`` pkl loader (mano/manolayer.py:350-394). Returns
    a backup dict for restore_modules()."""
    backup = {name: sys.modules.get(name)
              for name in ("chumpy", "chumpy.ch", "mano", "mano.manolayer")}
    ch = types.ModuleType("chumpy")
    ch.Ch = object
    ch.array = _as_ch
    ch.eye = lambda n: _as_ch(np.eye(n))
    ch.vstack = lambda arrs: _as_ch(np.vstack([np.asarray(a) for a in arrs]))
    ch.concatenate = lambda arrs: _as_ch(
        np.concatenate([np.asarray(a) for a in arrs]))
    ch_ch = types.ModuleType("chumpy.ch")
    ch_ch.MatVecMult = lambda m, v: _as_ch(
        np.asarray(m.todense() if hasattr(m, "todense") else m)
        @ np.asarray(v))
    ch.ch = ch_ch
    sys.modules["chumpy"] = ch
    sys.modules["chumpy.ch"] = ch_ch
    # force a fresh manolayer import under the functional stub
    for mod in ("mano.manolayer", "mano"):
        sys.modules.pop(mod, None)
    return backup


def restore_modules(backup):
    for name, mod in backup.items():
        if mod is None:
            sys.modules.pop(name, None)
        else:
            sys.modules[name] = mod
