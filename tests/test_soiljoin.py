"""SSURGO-plan conformance on fixture dims: the expected frame is computed by
an independent straight-pandas implementation inside the test (the style of
the reference's golden test, tests/vector/usda/test_ssurgo.py:14-255)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from demeter_ray.pipelines.soiljoin import PROPERTY_COLS, primary_soil_components

TOP, BOT = 0, 100


@pytest.fixture(scope="module")
def result(ray_session, tiny_fixtures):
    return primary_soil_components(tiny_fixtures, TOP, BOT)


@pytest.fixture(scope="module")
def reference(tiny_fixtures):
    """Slow independent recomputation with plain pandas."""
    comps = pq.read_table(f"{tiny_fixtures}/components.parquet").to_pandas()
    horizons = pq.read_table(f"{tiny_fixtures}/horizons.parquet").to_pandas()
    frags = pq.read_table(f"{tiny_fixtures}/fragments.parquet").to_pandas()
    fields = pq.read_table(f"{tiny_fixtures}/fields.parquet").to_pandas()

    major = comps[comps["majcompflag"] == "Yes"]
    rows = []
    for mk, g in major.groupby("map_unit_key"):
        m = g["comppct_r"].max()
        for _, r in g[g["comppct_r"] == m].iterrows():
            rows.append(r)
    primary = pd.DataFrame(rows)

    expected = {}
    for _, comp in primary.iterrows():
        ck = comp["component_key"]
        h = horizons[
            (horizons["component_key"] == ck)
            & (horizons["hzdepb_r"] > TOP)
            & (horizons["hzdept_r"] < BOT)
        ].copy()
        h["fine"] = (100 - h["fraggt10_r"] - h["frag3to10_r"]) * (h["sieveno10_r"] / 100)
        h["gravel"] = 100 - h["fine"]
        fr = frags[frags["horizon_key"].isin(h["horizon_key"])]
        vol = fr.groupby("horizon_key")["fragvol_r"].sum()
        h["fragvol"] = h["horizon_key"].map(vol)
        w = h["hzdepb_r"].clip(upper=BOT) - h["hzdept_r"].clip(lower=TOP)

        def wavg(vals):
            vals = vals.to_numpy(dtype=float)
            mask = np.isnan(vals)
            if mask.all():
                return None
            return float(np.average(vals[~mask], weights=w.to_numpy(dtype=float)[~mask]))

        kinds = sorted(
            fr[fr["fragkind"].notna()]["fragkind"].unique().tolist()
        )
        expected[ck] = {
            "sand": wavg(h["sandtotal_r"]),
            "silt": wavg(h["silttotal_r"]),
            "clay": wavg(h["claytotal_r"]),
            "om": wavg(h["om_r"]),
            "bd": wavg(h["dbovendry_r"]),
            "fine": wavg(h["fine"]),
            "fragvol": wavg(h["fragvol"]),
            "kinds": ", ".join(kinds) if kinds else None,
        }
    return primary, expected, fields


def test_ties_are_kept(result):
    # mukey % 5 == 0 plants two components tying on max comppct_r
    tied = [mk for mk in result["map_unit_key"].unique() if mk % 5 == 0]
    assert tied
    for mk in tied:
        rows = result[result["map_unit_key"] == mk]
        assert len(rows) == 2, f"ties must be kept for {mk}"
        assert rows["component_percent"].nunique() == 1


def test_no_major_component_keeps_null_row(result, tiny_fixtures):
    # mukeys whose components are all majcompflag='No' -> left-join null row
    comps = pq.read_table(f"{tiny_fixtures}/components.parquet").to_pandas()
    has_major = comps[comps["majcompflag"] == "Yes"]["map_unit_key"].unique()
    nulls = sorted(set(comps["map_unit_key"]) - set(has_major))
    assert nulls
    for mk in nulls:
        rows = result[result["map_unit_key"] == mk]
        assert len(rows) == 1
        assert pd.isna(rows["component_key"].iloc[0])


def test_weighted_averages_match_reference(result, reference):
    primary, expected, _ = reference
    got = result[result["component_key"].notna()].set_index("component_key")
    col = {
        "sand": "sand_percent_of_fine_fraction_by_weight",
        "silt": "silt_percent_of_fine_fraction_by_weight",
        "clay": "clay_percent_of_fine_fraction_by_weight",
        "om": "organic_matter_percent_of_fine_fraction_by_weight",
        "bd": "oven_dry_bulk_density_g_per_cm3",
        "fine": "fine_fraction_percent_by_weight",
        "fragvol": "fragment_percent_by_volume",
    }
    for ck, exp in expected.items():
        row = got.loc[ck]
        for short, full in col.items():
            g = row[full]
            if exp[short] is None:
                assert pd.isna(g), f"{ck}.{short} should be None"
            else:
                assert g == pytest.approx(exp[short]), f"{ck}.{short}"
        k = row["fragment_kind"]
        if exp["kinds"] is None:
            assert pd.isna(k)
        else:
            assert k == exp["kinds"]


def test_all_null_property_gives_none(result):
    # cokey % 9 == 0 plants all-null claytotal_r
    cand = result[result["component_key"].notna()]
    target = cand[cand["component_key"] % 9 == 0]
    if len(target):
        assert target["clay_percent_of_fine_fraction_by_weight"].isna().all()


def test_output_ordered_by_map_unit_key(result):
    keys = result["map_unit_key"].to_numpy()
    assert (np.diff(keys) >= 0).all()


def test_every_field_present(result, reference):
    _, _, fields = reference
    assert set(result["map_unit_key"]) == set(fields["map_unit_key"])
