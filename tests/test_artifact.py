"""The committed GENERALIZATION.json must stay coherent: right schema,
enough seeds, held-out far above the wrong-tiles ablation. This does NOT
train anything (the per-round training gate lives in bench.py); it stops
the ARTIFACT from silently rotting — wrong schema after a tool refactor,
a partial regeneration dropping a config (this bit an interim r5 state:
`--configs 7x7_*` overwrote the file without the 9×9 row), or a
weakened claim landing without the prose being updated."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED_CONFIGS = {
    "7x7_ch32", "7x7_ch16", "9x9_ch32x2", "11x11_curriculum",
}


def _artifact():
    with open(os.path.join(REPO, "GENERALIZATION.json")) as f:
        return json.load(f)


def test_artifact_schema_and_coverage():
    art = _artifact()
    assert art["metric"] == "ppo_mazes_generalization_frontier"
    by_name = {c["name"]: c for c in art["configs"]}
    assert set(by_name) == EXPECTED_CONFIGS
    for name, cfg in by_name.items():
        assert len(cfg["runs"]) >= 3, f"{name}: fewer than 3 seeds"
        assert cfg["recipe"]["eval_mazes"] >= 256, f"{name}: coarse eval"
        assert cfg["heldout_min"] == min(
            r["heldout_success"] for r in cfg["runs"]
        )
        assert cfg["ablation_max"] == max(
            r["wrong_tiles_ablation"] for r in cfg["runs"]
        )


def test_artifact_claims_hold():
    """The README/docs flagship claims, as committed numbers: held-out
    ≥0.9 on every seed of every config, and the ablation collapses (a
    ≥5× margin between worst held-out and worst ablation)."""
    for cfg in _artifact()["configs"]:
        assert cfg["heldout_min"] >= 0.9, cfg["name"]
        assert cfg["ablation_max"] <= 0.2, cfg["name"]
        assert cfg["heldout_min"] >= 5 * cfg["ablation_max"], cfg["name"]
