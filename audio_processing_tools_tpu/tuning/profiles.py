"""Named detector threshold profiles.

The reference exists to be tuned against labeled corpora
(reference ``edge/parameter_tuning/grid_search.py:51-117``); this module
ships the result of actually doing that with this framework's sweep
machinery, as *opt-in named profiles*.  The DEFAULT profile is untouched
and reference-exact — the 56-clip product-parity pin
(``tests/test_reference_differential_product.py``) and every accuracy
canary are defined on it.

``tuned-accuracy-v1`` was found by :func:`~audio_processing_tools_tpu.
tuning.grid_search.grid_search_vmapped`-style exact sweeps (the vmapped
decision math replicates ``rain_frame_decision`` + ``clip_aggregate``
bit-for-bit given the threshold-independent front-end features) starting
FROM the reference-default thresholds, on ``make_hard_corpus`` — selected
by joint accuracy over three corpus seeds (17 pinned, 23/29 held out)
under the hard constraint that both easy corpora (seeds 7, 11) stay
perfect.  Full-engine validation (``tests/test_accuracy_regression.py``):

==========  ========  =======
corpus      default   tuned
==========  ========  =======
hard17      24/32     28/32
hard23      23/32     27/32
hard29      20/32     27/32
easy7       24/24     24/24
easy11      24/24     24/24
==========  ========  =======

What moved and why: ``td_gate_threshold`` 2.5 -> 3.75 demands a sharper
time-domain crest before any frame may count as rain (kills the gust-front
false positives that dominate the default's hard-corpus errors);
``new_rain_mode12_flux_min`` 2.6 -> 2.3 and ``clip_rain_min_frames``
3 -> 2 recover the faint/drizzle sensitivity the stricter gate costs;
``new_rain_primary_flux_min`` 1.8 -> 2.0 keeps the easy corpora clean.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

# detector-level threshold overrides + processor-level aggregation override
_PROFILES: Dict[str, Dict[str, Any]] = {
    "tuned-accuracy-v1": {
        "detector": {
            "new_rain_primary_flux_min": 2.0,
            "new_rain_mode12_flux_min": 2.3,
            "td_gate_threshold": 3.75,
        },
        "clip_rain_min_frames": 2,
    },
}

TUNED_ACCURACY_V1 = "tuned-accuracy-v1"


def available_profiles() -> list:
    return sorted(_PROFILES)


def get_profile(name: str) -> Dict[str, Any]:
    """The raw override dict for ``name`` (a deep copy; mutate freely)."""
    try:
        return copy.deepcopy(_PROFILES[name])
    except KeyError:
        raise KeyError(
            f"unknown profile {name!r}; available: {available_profiles()}"
        ) from None


def apply_profile(params: Dict[str, Any] | None, name: str) -> Dict[str, Any]:
    """Engine/processor params with the named profile's overrides applied.

    ``params`` is the usual flat/nested param dict (``sample_rate``,
    ``detector`` sub-dict, ...); profile values win over what's present.
    The input dict is not mutated.

    >>> params = apply_profile({"sample_rate": 11162}, TUNED_ACCURACY_V1)
    >>> eng = SpectralNoiseEngine(); eng.setup(params)
    """
    out = copy.deepcopy(dict(params or {}))
    prof = get_profile(name)
    det = prof.pop("detector", {})
    out.setdefault("detector", {})
    out["detector"] = {**out["detector"], **det}
    out.update(prof)
    return out
