"""Every Config field must have a real consumer.

Round-1 review found 17 declared fields that were silently ignored —
worse than not declaring them (VERDICT.md). This test enforces the
invariant going forward: each dataclass field either

* has a grep-able attribute read (``.field_name``) somewhere in the
  package / entry points — including ``Config.__post_init__``, whose
  validations mirror the reference's own raise semantics, or
* is a structural key consumed by name in config.py itself.

Reference flags that are dead in the reference too are deliberately NOT
fields: they pass through CLI/YAML into ``cfg.extras`` (see PARITY.md
"Reference-dead config flags").
"""

import dataclasses
import os
import re

from acr_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# consumed by name (dict key / CLI plumbing) rather than attribute read
STRUCTURAL = {"extras", "configs_yml"}

# flags the reference declares but never reads; they must NOT be fields
REFERENCE_DEAD = [
    "soi_camera", "vis_otherview", "higher_resolution", "model_version",
    "multi_hand", "backbone", "batch_size", "merge_mano_camera_head",
    "use_coordmaps",
]


def _source_blob():
    chunks = []
    roots = [os.path.join(REPO, "acr_tpu")]
    singles = [os.path.join(REPO, "bench.py"),
               os.path.join(REPO, "__graft_entry__.py")]
    for root in roots:
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith(".py"):
                    with open(os.path.join(dirpath, n)) as f:
                        chunks.append(f.read())
    for p in singles:
        with open(p) as f:
            chunks.append(f.read())
    return "\n".join(chunks)


def test_every_field_is_consumed():
    blob = _source_blob()
    # strip the dataclass field declarations so `name: type = default`
    # lines don't count as consumption; attribute reads are `.name`
    unconsumed = []
    for f in dataclasses.fields(Config):
        if f.name in STRUCTURAL:
            continue
        if not re.search(r"\.%s\b" % re.escape(f.name), blob):
            unconsumed.append(f.name)
    assert not unconsumed, (
        f"Config fields with no attribute read anywhere: {unconsumed} — "
        "wire them or delete them (PARITY.md lists the reference-dead set)")


def test_reference_dead_flags_are_not_fields():
    names = {f.name for f in dataclasses.fields(Config)}
    leaked = [n for n in REFERENCE_DEAD if n in names]
    assert not leaked, f"reference-dead flags resurrected as fields: {leaked}"


def test_reference_dead_flags_route_to_extras():
    from acr_tpu.config import make_config
    cfg = make_config(cli_overrides={"soi_camera": "far", "backbone": "hrnet"})
    assert cfg.extras["soi_camera"] == "far"
    assert cfg.extras["backbone"] == "hrnet"


def test_reference_dead_flags_documented_in_parity():
    with open(os.path.join(REPO, "PARITY.md")) as f:
        parity = f.read()
    for name in REFERENCE_DEAD:
        assert f"`--{name}`" in parity, f"{name} missing from PARITY.md"


def test_invalid_configs_raise():
    import pytest
    with pytest.raises(ValueError, match="FreiHand"):
        Config(dataset="FreiHand")
    with pytest.raises(ValueError, match="prior_mode"):
        Config(inter_prior=False)
    with pytest.raises(ValueError, match="train-only"):
        Config(attention_mode="gt-part")
    with pytest.raises(ValueError, match="offset_mode"):
        Config(offset_mode="bogus")
    with pytest.raises(ValueError, match="rot_dim=3"):
        Config(Rot_type="angular")
    # valid non-default combinations construct fine
    Config(inter_prior=False, prior_mode="none")
    Config(Rot_type="angular", rot_dim=3)
    Config(offset_mode="offset")
