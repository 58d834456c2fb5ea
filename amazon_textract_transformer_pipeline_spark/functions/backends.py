"""Deployment policy for optional ctypes codec backends (libwebp, libheif,
libde265).

Problem this solves (round-5 ADVICE): the lossy-WebP / HEIC / HEVC decode
paths bind to *system* shared libraries. On a mixed fleet where some hosts
ship the library and some don't, the same corpus would yield pixel rows on
one executor and error-column rows on another — nondeterministic output at
the cluster level. The fix is a per-deployment policy, fixed once and
propagated to every executor through the environment (``spark-submit --conf
spark.executorEnv.ATTP_CODEC_BACKENDS=...``):

* ``auto`` (default) — use a backend when its library loads; absent →
  the declared per-record ValueError seam. Right for single-image fleets
  (uniform AMI/container) and for this sandbox.
* ``require`` — a missing library is a *deployment* error: raise
  RuntimeError at first use instead of silently degrading rows. Right for
  production fleets that claim full decode coverage.
* ``none`` — never load the libraries; every backed format takes the seam
  ValueError even where a library exists. Pins output byte-identical to a
  library-less fleet (the deterministic lowest common denominator).

The policy is read per call (cheap: one dict lookup after the first probe)
so tests can monkeypatch the environment; library probes themselves are
cached per process.
"""

from __future__ import annotations

import os

CODEC_BACKEND_ENV = "ATTP_CODEC_BACKENDS"
_POLICIES = ("auto", "require", "none")

#: probe cache: backend name -> loaded lib or None (never stores under
#: the "none" policy so a later policy change re-probes)
_PROBE_CACHE: dict[str, object] = {}


def codec_backend_policy() -> str:
    pol = os.environ.get(CODEC_BACKEND_ENV, "auto").strip().lower()
    if pol not in _POLICIES:
        raise RuntimeError(
            f"{CODEC_BACKEND_ENV}={pol!r} invalid; one of {_POLICIES}")
    return pol


def resolve_backend(name: str, loader):
    """Apply the deployment policy to one backend.

    ``loader`` is a zero-arg callable returning the ctypes lib or None.
    Returns the lib (or None for the seam path); raises RuntimeError when
    policy is ``require`` and the library is absent.
    """
    pol = codec_backend_policy()
    if pol == "none":
        return None
    if name not in _PROBE_CACHE:
        _PROBE_CACHE[name] = loader()
    lib = _PROBE_CACHE[name]
    if lib is None and pol == "require":
        raise RuntimeError(
            f"codec backend {name} required by {CODEC_BACKEND_ENV}=require "
            "but its shared library did not load on this host")
    return lib


def codec_backend_report() -> dict[str, object]:
    """One-line deployment record: the active policy plus which backends
    actually load on this host. Session setup logs this so a cluster run
    leaves evidence of the decode surface it ran with."""
    from . import av, heif, webp

    return {
        "policy": codec_backend_policy(),
        "libwebp": webp.libwebp_available(),
        "libheif": heif.libheif_available(),
        "libde265": av.libde265_available(),
    }
