"""The SSURGO relational plan over the fixture dimension tables, Ray-first.

Reproduces the exact semantics of fetch_primary_soil_components
(/root/reference/demeter/vector/usda/ssurgo.py:111-179 and the SQL at
:20-108), conformance target tests/vector/usda/test_ssurgo.py:14-255:

1. primary components: per map unit the majcompflag='Yes' component(s) with
   max comppct_r — TOP 1 WITH TIES (ties KEPT, :42-58); map units with no
   major component keep a null component (LEFT JOIN);
2. horizons: interval join ``hzdepb_r > top AND hzdept_r < bottom`` (:70-96)
   + derived fine_fraction / gravel columns (:78, :92);
3. fragments: per-horizon sum of fragvol_r + unique kinds; null fragkind
   summed but excluded from kinds (:98-108, :231-240);
4. depth-weighted average per component with depths clipped to the range,
   missing values ignored, all-missing -> None (:270-301);
5. fragment kinds per component: ', '.join(sorted(unique)) (:261-267);
6. one-to-one left merge into components, output ORDER BY map_unit_key
   (:66-67, :160-165).

Shuffle plan (SURVEY.md §7.4): groupby map_unit_key (top-k), broadcast
fragments rollup (small), groupby component_key (weighted avg).  Dimension
tables are small per region; the wide side at scale is the horizons table,
which only ever shuffles on component_key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data

from demeter_ray.pipelines.relational import bcast, partial_combine

PROPERTY_COLS = [
    "fine_fraction_percent_by_weight",
    "gravel_percent_by_weight",
    "sand_percent_of_fine_fraction_by_weight",
    "silt_percent_of_fine_fraction_by_weight",
    "clay_percent_of_fine_fraction_by_weight",
    "organic_matter_percent_of_fine_fraction_by_weight",
    "oven_dry_bulk_density_g_per_cm3",
    "fragment_percent_by_volume",
]


def primary_soil_components(
    fixture_dir: str, top_depth_cm: int = 0, bottom_depth_cm: int = 100
) -> pd.DataFrame:
    if bottom_depth_cm <= top_depth_cm:
        raise ValueError("bottom_depth_cm must be greater than top_depth_cm")

    fields = pq.read_table(
        f"{fixture_dir}/fields.parquet",
        columns=["map_unit_key", "map_unit_symbol", "map_unit_name"],
    ).to_pandas()

    # 1. grouped top-1-with-ties over major components ---------------------
    # broadcast-group-max shape (relational.grouped_top1_with_ties): partial
    # per-batch maxes -> tiny combine -> broadcast max map -> vectorized
    # tie filter.  No per-group Python at any map-unit cardinality.
    comps = ray.data.read_parquet(f"{fixture_dir}/components.parquet")
    comps = comps.filter(expr="majcompflag == 'Yes'")

    def max_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("map_unit_key", as_index=False)["comppct_r"].max()

    maxmap = (
        partial_combine(comps, max_partial)
        .groupby("map_unit_key")["comppct_r"]
        .max()
    )
    mref = ray.put(maxmap)

    def keep_ties(b: pd.DataFrame, mm) -> pd.DataFrame:
        return b[b["comppct_r"].to_numpy() == b["map_unit_key"].map(mm).to_numpy()]

    primary = comps.map_batches(bcast(mref, keep_ties), batch_format="pandas").to_pandas()
    primary = primary.rename(
        columns={
            "component_key": "component_key",
            "comppct_r": "component_percent",
            "compname": "component_name",
            "compkind": "component_kind",
            "drainagecl": "drainage_class",
        }
    )

    # 2. horizons interval join (broadcast the primary component key set) --
    keys = frozenset(primary["component_key"].tolist())
    kref = ray.put(keys)

    class HorizonFilter:
        def __init__(self):
            self.keys = ray.get(kref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[
                b["component_key"].isin(self.keys)
                & (b["hzdepb_r"] > top_depth_cm)
                & (b["hzdept_r"] < bottom_depth_cm)
            ].copy()
            b["fine_fraction_percent_by_weight"] = (
                100 - b["fraggt10_r"] - b["frag3to10_r"]
            ) * (b["sieveno10_r"] / 100)
            b["gravel_percent_by_weight"] = 100 - b["fine_fraction_percent_by_weight"]
            return b.rename(
                columns={
                    "hzdept_r": "top_depth_cm",
                    "hzdepb_r": "bottom_depth_cm",
                    "sandtotal_r": "sand_percent_of_fine_fraction_by_weight",
                    "silttotal_r": "silt_percent_of_fine_fraction_by_weight",
                    "claytotal_r": "clay_percent_of_fine_fraction_by_weight",
                    "om_r": "organic_matter_percent_of_fine_fraction_by_weight",
                    "dbovendry_r": "oven_dry_bulk_density_g_per_cm3",
                }
            )

    horizons = ray.data.read_parquet(f"{fixture_dir}/horizons.parquet").map_batches(
        HorizonFilter, batch_format="pandas", concurrency=(1, 4)
    )

    # 3. fragments rollup per horizon (broadcast — fragments are tiny) -----
    frags = pq.read_table(f"{fixture_dir}/fragments.parquet").to_pandas()
    vol = frags.groupby("horizon_key", as_index=False)["fragvol_r"].sum().rename(
        columns={"fragvol_r": "fragment_percent_by_volume"}
    )
    kinds = (
        frags[frags["fragkind"].notna()]
        .groupby("horizon_key")["fragkind"]
        # store as a joined string: arrays inside pandas blocks break Ray's
        # block serialization (tensor-extension cast on ragged arrays)
        .agg(lambda v: "|".join(sorted(set(v))))
        .rename("fragment_kind")
        .reset_index()
    )
    frag_roll = vol.merge(kinds, how="left", on="horizon_key")
    fref = ray.put(frag_roll.set_index("horizon_key"))

    class AttachFragments:
        def __init__(self):
            self.roll = ray.get(fref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(self.roll, how="left", left_on="horizon_key", right_index=True)

    horizons = horizons.map_batches(AttachFragments, batch_format="pandas", concurrency=(1, 4))

    # 4+5. per-component depth-weighted averages + fragment kinds ----------
    # partial-agg + combine (the ssurgo_analog_plan shape, no per-group
    # Python): each batch emits one row per component with (sum w*v, sum w)
    # per property — missing values contribute to neither — plus its kinds
    # union; the driver finishes the reduction.  Partial rows are
    # O(components x batches), region-dim scale.
    wv_cols = [f"wv__{c}" for c in PROPERTY_COLS]
    w_cols = [f"w__{c}" for c in PROPERTY_COLS]

    def comp_partial(b: pd.DataFrame) -> pd.DataFrame:
        tops = b["top_depth_cm"].clip(lower=top_depth_cm)
        bottoms = b["bottom_depth_cm"].clip(upper=bottom_depth_cm)
        w = (bottoms - tops).to_numpy(dtype=np.float64)
        data = {"component_key": b["component_key"].to_numpy()}
        for col in PROPERTY_COLS:
            v = b[col].to_numpy(dtype=np.float64)
            ok = ~np.isnan(v)
            data[f"wv__{col}"] = np.where(ok, w * v, 0.0)
            data[f"w__{col}"] = np.where(ok, w, 0.0)
        agg_num = pd.DataFrame(data).groupby("component_key", as_index=False).sum()
        kinds = (
            b.dropna(subset=["fragment_kind"])
            .groupby("component_key")["fragment_kind"]
            .agg(lambda v: "|".join(sorted(set(k for j in v for k in j.split("|")))))
        )
        agg_num["kinds"] = agg_num["component_key"].map(kinds).astype(object)
        return agg_num

    parts = partial_combine(horizons, comp_partial)
    num = parts.groupby("component_key", as_index=False)[wv_cols + w_cols].sum()
    agg = pd.DataFrame({"component_key": num["component_key"]})
    for col in PROPERTY_COLS:
        wv = num[f"wv__{col}"].to_numpy(dtype=np.float64)
        ws = num[f"w__{col}"].to_numpy(dtype=np.float64)
        # all-missing -> NaN (the reference's all-masked -> None, ssurgo.py:289-297)
        agg[col] = np.where(ws > 0, wv / np.where(ws > 0, ws, 1.0), np.nan)
    kind_union = (
        parts.dropna(subset=["kinds"])
        .groupby("component_key")["kinds"]
        .agg(lambda v: ", ".join(sorted(set(k for j in v for k in j.split("|")))))
    )
    fk = agg["component_key"].map(kind_union).astype(object)
    agg["fragment_kind"] = fk.where(fk.notna(), None)

    # 6. one-to-one left merges + output order -----------------------------
    out = fields.merge(primary, how="left", on="map_unit_key")
    out = out.merge(agg, how="left", on="component_key", validate="many_to_one")
    return out.sort_values(
        ["map_unit_key", "component_key"], kind="mergesort"
    ).reset_index(drop=True)
