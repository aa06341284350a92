"""Driver-side static schema inference over a Dataset's logical plan.

Ray Data drops a dataset's schema when the input is entirely empty: map
UDFs are never invoked on zero-row blocks, so every downstream block
simply never exists and ``to_pandas()`` returns a column-less frame.  A
pipeline that then touches a column by name crashes on legal empty input
(a filter that matched nothing, an empty partition of a 100-TB run).

``infer_schema_static`` recovers the output schema WITHOUT executing the
plan by walking the logical operator DAG:

- ``Read`` / ``InputData`` carry their schema in scan metadata;
- schema-preserving operators (Sort, Limit, RandomShuffle, Repartition,
  Filter) recurse to their input;
- ``Project`` applies the column selection / rename statically;
- ``MapBatches`` UDFs are evaluated ONCE on a zero-row typed batch of the
  input schema driver-side (this repo's batch fns are total on typed
  empty input) — the cost is microseconds and there is no Ray execution;
- ``Union`` merges inputs, ``Join`` composes the two sides with Ray's
  suffix rules, ``Aggregate`` emits key columns plus each AggregateFn's
  output column.

Returns ``None`` whenever an operator's output schema genuinely cannot
be known statically (class-based UDFs with constructor state, per-row
``map``/``flat_map`` fns, a UDF that fails on empty input) — callers fall
back to their non-typed behavior, never to a wrong schema.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "infer_schema_static",
    "typed_empty_table",
    "collect_df",
    "explain_plan",
    "install_typed_empty_to_pandas",
]

# operators whose output schema equals their (single) input's schema
_PASSTHROUGH = {
    "Sort",
    "Limit",
    "RandomShuffle",
    "Repartition",
    "StreamingRepartition",
    "RandomizeBlocks",
    "Filter",
    "MaterializeBlock",
}


def infer_schema_static(ds) -> Optional[pa.Schema]:
    """Best-effort static output schema of ``ds`` (no plan execution)."""
    try:
        sch = _infer_op(ds._logical_plan.dag)
    except Exception:
        return None
    # a zero-field schema is "unknown", not "no columns" — a group-wise
    # wrapper fn that emits nothing on empty input must not poison callers
    return sch if sch is not None and len(sch) > 0 else None


def explain_plan(ds) -> str:
    """Human-readable logical plan tree with the STATICALLY inferred
    output schema at every operator (``?`` where inference stops — per-row
    UDFs, unknown ops).  Pure driver-side walk: nothing executes.

    >>> print(explain_plan(read_table(sf, "nation").sort("n_name")))
    Sort  [n_nationkey:int32, n_name:string, ...]
      Read  [n_nationkey:int32, n_name:string, ...]
    """
    lines: list = []

    def fmt(sch: Optional[pa.Schema]) -> str:
        if sch is None:
            return "[?]"
        cols = ", ".join(f"{f.name}:{f.type}" for f in sch)
        return f"[{cols}]"

    def walk(op, depth: int) -> None:
        try:
            sch = _infer_op(op)
            if sch is not None and len(sch) == 0:
                sch = None
        except Exception:
            sch = None
        name = getattr(op, "_name", None) or type(op).__name__
        lines.append(f"{'  ' * depth}{name}  {fmt(sch)}")
        for dep in op.input_dependencies:
            walk(dep, depth + 1)

    walk(ds._logical_plan.dag, 0)
    return "\n".join(lines)


def typed_empty_table(ds) -> Optional[pa.Table]:
    """A zero-row Arrow table with ``ds``'s statically-inferred schema."""
    sch = infer_schema_static(ds)
    return None if sch is None else sch.empty_table()


def collect_df(ds) -> pd.DataFrame:
    """``ds.to_pandas()`` that stays TYPED on all-empty input: when Ray
    returns a column-less frame (every block was skipped), rebuild the
    empty frame from the statically-inferred plan schema so downstream
    column access works on legal empty results.  Accepts anything with a
    ``to_pandas`` method; non-Datasets pass through unchanged."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        sch = infer_schema_static(ds)
        if sch is not None:
            return sch.empty_table().to_pandas()
    return df


def dataset_from_typed_df(df: pd.DataFrame):
    """``ray.data.from_pandas`` that keeps the schema discoverable when
    ``df`` is EMPTY: a zero-row pandas block carries no usable schema
    (object columns would degrade to Arrow null), so build a typed Arrow
    block instead (object dtype -> string, matching this repo's usage)."""
    import ray.data as rd

    if len(df):
        return rd.from_pandas(df)
    fields = []
    for c in df.columns:
        dt = df[c].dtype
        if dt == np.dtype("O"):
            fields.append(pa.field(str(c), pa.string()))
        else:
            try:
                fields.append(pa.field(str(c), pa.from_numpy_dtype(dt)))
            except Exception:
                fields.append(pa.field(str(c), pa.string()))
    return rd.from_arrow(pa.schema(fields).empty_table())


def install_typed_empty_to_pandas() -> None:
    """Patch ``ray.data.Dataset.to_pandas`` with the ``collect_df``
    behavior package-wide (idempotent).

    Rationale: Ray's executor never invokes map UDFs on zero-row blocks,
    so a dataset whose input is entirely empty loses its schema and
    ``to_pandas()`` returns a COLUMN-LESS frame — every driver-side sink
    that then touches a column by name crashes on legal empty input.  The
    static plan walk recovers the schema without executing anything; when
    it cannot, behavior is exactly Ray's.  Applied at ``import
    demeter_ray`` so all ~100 sink sites inherit it."""
    import ray.data

    orig = ray.data.Dataset.to_pandas
    if getattr(orig, "_demeter_typed_empty", False):
        return

    def to_pandas(self, *args, **kwargs):
        df = orig(self, *args, **kwargs)
        if df.shape[1] == 0:
            sch = infer_schema_static(self)
            if sch is not None:
                return sch.empty_table().to_pandas()
        return df

    to_pandas._demeter_typed_empty = True
    ray.data.Dataset.to_pandas = to_pandas

    # materialize() re-roots the plan at InputData, whose bundles carry no
    # schema when every block is empty — stamp the pre-materialize static
    # schema on the new root so the walk survives two-pass (sort ->
    # materialize -> partials) pipelines
    orig_mat = ray.data.Dataset.materialize

    def materialize(self, *args, **kwargs):
        out = orig_mat(self, *args, **kwargs)
        try:
            # lazy thunk, not an eager walk: inference may instantiate
            # class UDFs driver-side, which hot paths must never pay for.
            # Capture only the LOGICAL DAG root — not the Dataset — so the
            # thunk pins the plan's op objects (whose UDF closures the
            # walk needs) but not the plan/executor wrappers.  A weakref
            # would die immediately for `ds.sort(...).materialize()`
            # chains, whose intermediate Dataset is temporary.
            root = self._logical_plan.dag

            def thunk(r=root):
                try:
                    sch = _infer_op(r)
                except Exception:
                    return None
                return sch if sch is not None and len(sch) > 0 else None

            out._logical_plan.dag._demeter_schema_thunk = thunk
        except Exception:
            pass
        return out

    materialize._demeter_typed_empty = True
    ray.data.Dataset.materialize = materialize

    _install_join_empty_partition_fix()


def _install_join_empty_partition_fix() -> None:
    """Ray's hash-shuffle join builds each partition side from received
    shards; a side that contributed NO shards (an all-empty input — e.g. a
    filter that matched nothing) becomes a COLUMN-LESS table and Arrow's
    acero join fails with "No match for key field".

    Fix: a ``JoiningShuffleAggregation`` subclass whose ``finalize``
    rebuilds a column-less side as a TYPED empty table (schema remembered
    from any shard this aggregator saw, else just the key columns typed
    from the other side).  The subclass is injected as ``JoinOperator``'s
    default ``shuffle_aggregation_type`` — the aggregation factory lambda
    cloudpickles the class BY VALUE into the aggregator actors, so the fix
    reaches worker processes without patching installed Ray code there.
    Idempotent and version-guarded: any import/signature drift leaves Ray
    untouched."""
    try:
        from ray.data._internal.execution.operators.join import (
            _JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP,
            JoinOperator,
            JoiningShuffleAggregation,
        )
    except Exception:
        return
    if getattr(JoinOperator, "_demeter_empty_fix", False):
        return

    class DemeterJoinAggregation(JoiningShuffleAggregation):
        def accept(self, input_seq_id, partition_id, partition_shard):
            try:
                sch = getattr(partition_shard, "schema", None)
                if sch is not None and len(sch) > 0:
                    if not hasattr(self, "_demeter_seen_schemas"):
                        self._demeter_seen_schemas = {}
                    self._demeter_seen_schemas.setdefault(input_seq_id, sch)
            except Exception:
                pass
            return super().accept(input_seq_id, partition_id, partition_shard)

        # per-join static input schemas, stamped by join_init below (the
        # dynamic subclass cloudpickles by value into aggregator actors)
        _demeter_static_schemas: dict = {}

        def _demeter_typed_empty_side(self, seq_id, own_keys, other_keys,
                                      other_tbl):
            seen = getattr(self, "_demeter_seen_schemas", {}).get(seq_id)
            if seen is not None:
                return seen.empty_table()
            static = self._demeter_static_schemas.get(seq_id)
            if static is not None:
                return static.empty_table()
            # last resort: key columns only, typed from the other side —
            # outer-join outputs would lack this side's payload columns,
            # but zero-row results (inner/semi) stay correct
            fields = []
            for k, ok in zip(own_keys, other_keys):
                idx = other_tbl.schema.get_field_index(ok)
                typ = (other_tbl.schema.field(idx).type if idx >= 0
                       else pa.int64())
                fields.append(pa.field(k, typ))
            return pa.schema(fields).empty_table()

        def finalize(self, partition_id):
            left = self._get_partition_builder(
                input_seq_id=0, partition_id=partition_id).build()
            right = self._get_partition_builder(
                input_seq_id=1, partition_id=partition_id).build()
            if left.num_columns > 0 and right.num_columns > 0:
                return super().finalize(partition_id)
            if left.num_columns == 0 and right.num_columns == 0:
                return pa.table({})  # zero-row block; vanishes downstream
            lkeys = list(self._left_key_col_names)
            rkeys = list(self._right_key_col_names)
            if left.num_columns == 0:
                left = self._demeter_typed_empty_side(0, lkeys, rkeys, right)
            else:
                right = self._demeter_typed_empty_side(1, rkeys, lkeys, left)
            return left.join(
                right,
                join_type=_JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[self._join_type],
                keys=lkeys,
                right_keys=rkeys,
                left_suffix=self._left_columns_suffix,
                right_suffix=self._right_columns_suffix,
            )

    orig_init = JoinOperator.__init__

    def _static_schema_of_physical(phys) -> Optional[pa.Schema]:
        # the planner links each physical op to its logical op before the
        # join is planned (topological order), so the walker can run on
        # the logical inputs — no execution
        for lop in reversed(getattr(phys, "_logical_operators", None) or []):
            try:
                sch = _infer_op(lop)
            except Exception:
                sch = None
            if sch is not None and len(sch) > 0:
                return sch
        return None

    def join_init(self, *args, **kwargs):
        if kwargs.get("shuffle_aggregation_type") is None:
            schemas = {
                0: _static_schema_of_physical(kwargs.get("left_input_op")),
                1: _static_schema_of_physical(kwargs.get("right_input_op")),
            }

            class _JoinAgg(DemeterJoinAggregation):
                _demeter_static_schemas = {
                    k: v for k, v in schemas.items() if v is not None
                }

            kwargs["shuffle_aggregation_type"] = _JoinAgg
        return orig_init(self, *args, **kwargs)

    JoinOperator.__init__ = join_init
    JoinOperator._demeter_empty_fix = True


def _normalize_schema(sch) -> Optional[pa.Schema]:
    """Arrow schema from either a pa.Schema or a PandasBlockSchema."""
    if sch is None:
        return None
    if isinstance(sch, pa.Schema):
        return sch
    names = getattr(sch, "names", None)
    types = getattr(sch, "types", None)
    if names is None or types is None:
        return None
    fields = []
    for n, t in zip(names, types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
            continue
        try:
            dt = np.dtype(t)
            if dt == np.dtype("O"):
                fields.append(pa.field(n, pa.string()))
            else:
                fields.append(pa.field(n, pa.from_numpy_dtype(dt)))
        except Exception:
            fields.append(pa.field(n, pa.string()))
    return pa.schema(fields)


def _schema_of_batch(out) -> Optional[pa.Schema]:
    """Schema of a UDF's output batch (Table / DataFrame / dict-of-arrays)."""
    if isinstance(out, pa.Table):
        return out.schema
    if isinstance(out, pd.DataFrame):
        return pa.Table.from_pandas(out.iloc[0:0], preserve_index=False).schema
    if isinstance(out, dict):
        cols = {}
        for k, v in out.items():
            arr = np.asarray(v)
            try:
                cols[k] = pa.array(arr[:0])
            except Exception:
                cols[k] = pa.array([], pa.string())
        return pa.table(cols).schema
    return None


def _eval_udf_on_empty(op, in_schema: pa.Schema) -> Optional[pa.Schema]:
    """Run a MapBatches fn once on a typed zero-row batch, driver-side.

    Class-based (actor-pool) UDFs are instantiated with their constructor
    args — this repo's stage actors do bounded setup (compile patterns,
    ``ray.get`` a broadcast ref) so a one-off driver-side instance is
    cheap; any failure just means "schema unknown", never a wrong one."""
    fn = getattr(op, "_fn", None)
    if fn is None or not callable(fn):
        return None
    if isinstance(fn, type):
        try:
            ctor_args = getattr(op, "_fn_constructor_args", None) or ()
            ctor_kwargs = getattr(op, "_fn_constructor_kwargs", None) or {}
            fn = fn(*ctor_args, **ctor_kwargs)
        except Exception:
            return None
    bf = getattr(op, "_batch_format", None) or "pyarrow"
    empty = in_schema.empty_table()
    batch = empty.to_pandas() if bf == "pandas" else empty
    args = getattr(op, "_fn_args", None) or ()
    kwargs = getattr(op, "_fn_kwargs", None) or {}
    try:
        out = fn(batch, *args, **kwargs)
        # map_batches fns may be generators yielding batches
        if not isinstance(out, (pa.Table, pd.DataFrame, dict)) and hasattr(
            out, "__iter__"
        ):
            out = next(iter(out), None)
    except Exception:
        return None
    sch = _schema_of_batch(out)
    if sch is None:
        return None
    # zero-row pandas object columns arrive as Arrow null: restore the
    # input's type for pass-through columns, string for new ones (this
    # repo's object columns are strings; anything else shows up in the
    # inferred-vs-actual parity test)
    in_types = {f.name: f.type for f in in_schema}
    fields = [
        pa.field(f.name, in_types.get(f.name, pa.string()))
        if pa.types.is_null(f.type) else f
        for f in sch
    ]
    return pa.schema(fields)


# AggregateFn output column types by class name (fixed-output aggs)
_AGG_FIXED_TYPES = {
    "Count": pa.int64(),
    "Mean": pa.float64(),
    "Std": pa.float64(),
    "Quantile": pa.float64(),
}


def _agg_output_type(cls: str, base: Optional[pa.DataType]) -> Optional[pa.DataType]:
    """Output type of a Ray AggregateFn, or None when not certain — the
    module contract is 'never a guessed-wrong schema', so unknown agg
    classes fail the walk instead of defaulting."""
    if cls in _AGG_FIXED_TYPES:
        return _AGG_FIXED_TYPES[cls]
    if base is None:
        return None
    if cls == "Sum":  # Arrow sums widen to 64-bit
        if pa.types.is_unsigned_integer(base):
            return pa.uint64()
        if pa.types.is_integer(base):
            return pa.int64()
        if pa.types.is_floating(base):
            return pa.float64()
        return None
    if cls in ("Min", "Max", "AbsMax"):
        return base
    if cls == "Unique":
        return pa.list_(base)
    return None


def _aggregate_schema(op, in_schema: pa.Schema) -> Optional[pa.Schema]:
    key = getattr(op, "_key", None)
    keys = [key] if isinstance(key, str) else list(key or [])
    fields = []
    for k in keys:
        idx = in_schema.get_field_index(k)
        if idx < 0:
            return None
        f = in_schema.field(idx)
        # Ray's hash aggregate widens integer key columns to 64-bit
        # (pinned by test_inferred_schema_matches_actual_on_nonempty)
        if pa.types.is_unsigned_integer(f.type):
            f = pa.field(f.name, pa.uint64())
        elif pa.types.is_integer(f.type):
            f = pa.field(f.name, pa.int64())
        fields.append(f)
    for agg in getattr(op, "_aggs", None) or ():
        name = getattr(agg, "name", None)
        if not isinstance(name, str):
            return None
        target = getattr(agg, "_target_col_name", None)
        base = None
        if target is not None:
            idx = in_schema.get_field_index(target)
            base = in_schema.field(idx).type if idx >= 0 else None
        typ = _agg_output_type(type(agg).__name__, base)
        if typ is None:
            return None
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def _join_schema(op, left: pa.Schema, right: pa.Schema) -> pa.Schema:
    """Ray join column rules: LEFT columns in their original order (key
    columns stay in place), then right non-key columns; suffixes apply to
    colliding non-key names when given."""
    lkeys = set(getattr(op, "_left_key_columns", ()) or ())
    rkeys = set(getattr(op, "_right_key_columns", ()) or ())
    lsuf = getattr(op, "_left_columns_suffix", None) or ""
    rsuf = getattr(op, "_right_columns_suffix", None) or ""
    r_nonkey = {f.name for f in right if f.name not in rkeys}
    fields = []
    for f in left:
        collides = f.name not in lkeys and f.name in r_nonkey
        fields.append(pa.field(f.name + lsuf, f.type) if collides and lsuf else f)
    lnames = {f.name for f in left}
    for f in right:
        if f.name in rkeys:
            continue
        collides = f.name in lnames
        fields.append(pa.field(f.name + rsuf, f.type) if collides and rsuf else f)
    # de-dup identical names (no-suffix collisions keep the first)
    seen, out = set(), []
    for f in fields:
        if f.name not in seen:
            seen.add(f.name)
            out.append(f)
    return pa.schema(out)


def _project_schema(op, in_schema: pa.Schema) -> Optional[pa.Schema]:
    cols = getattr(op, "_cols", None)
    rename = getattr(op, "_cols_rename", None)
    if getattr(op, "_exprs", None):
        return None  # expression projections: types not derivable here
    if cols:
        fields = []
        for c in cols:
            idx = in_schema.get_field_index(c)
            if idx < 0:
                return None
            fields.append(in_schema.field(idx))
        in_schema = pa.schema(fields)
    if rename:
        in_schema = pa.schema(
            [pa.field(rename.get(f.name, f.name), f.type) for f in in_schema]
        )
    return in_schema


def _infer_op(op) -> Optional[pa.Schema]:
    kind = type(op).__name__
    deps = op.input_dependencies

    if kind == "Read":
        md = getattr(op, "_cached_output_metadata", None)
        for m in md if isinstance(md, (list, tuple)) else [md]:
            sch = _normalize_schema(getattr(m, "schema", None))
            if sch is not None:
                return sch
        src = getattr(op, "_datasource", None)
        return _normalize_schema(getattr(src, "_inferred_schema", None))

    if kind in ("InputData", "FromArrow", "FromPandas", "FromItems", "FromNumpy"):
        thunk = getattr(op, "_demeter_schema_thunk", None)
        if thunk is not None:
            sch = thunk()
            if sch is not None:
                return sch
        for bundle in getattr(op, "input_data", None) or ():
            sch = _normalize_schema(getattr(bundle, "schema", None))
            if sch is not None:
                return sch
        return None

    if kind in _PASSTHROUGH:
        return _infer_op(deps[0]) if deps else None

    if kind == "Union":
        # heterogeneous unions surface the merged column set (first type
        # wins on shared names)
        merged: list = []
        seen: set = set()
        any_known = False
        for d in deps:
            sch = _infer_op(d)
            if sch is None:
                continue
            any_known = True
            for f in sch:
                if f.name not in seen:
                    seen.add(f.name)
                    merged.append(f)
        return pa.schema(merged) if any_known else None

    if kind == "Project":
        sch = _infer_op(deps[0]) if deps else None
        return None if sch is None else _project_schema(op, sch)

    if kind == "MapBatches":
        sch = _infer_op(deps[0]) if deps else None
        return None if sch is None else _eval_udf_on_empty(op, sch)

    if kind == "Aggregate":
        sch = _infer_op(deps[0]) if deps else None
        return None if sch is None else _aggregate_schema(op, sch)

    if kind == "Join":
        left = _infer_op(deps[0]) if deps else None
        right = _infer_op(deps[1]) if len(deps) > 1 else None
        if left is None or right is None:
            return None
        return _join_schema(op, left, right)

    # MapRows / FlatMap / unknown operators: not statically knowable
    return None
