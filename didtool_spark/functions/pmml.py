"""PMML 4.4 export for the engine's GBM scoring pipeline.

The reference exports its fitted pipeline (DataFrameMapper encoders +
LGBMClassifier) with sklearn2pmml (didtool/model.py:282-304 —
``need_pmml``/``sklearn2pmml(self.pipeline, ...)``) so models deploy to
JVM/PMML scorers. sklearn2pmml is not in this container and would drag
a JVM converter into the driver; the engine's booster is a plain
histogram GBM (functions.driver_fit.NumpyGBM), so this module writes
the PMML document directly with the stdlib XML tools:

- DataDictionary: one DataField per raw input (categorical string for
  woe/label-encoded features, continuous double otherwise);
- TransformationDictionary: one MapValues DerivedField per fitted
  encoder — the exact value->woe / value->code maps the Spark
  expressions and the pandas training encode share, including their
  missing/unseen defaults;
- a model-chain MiningModel: segment 1 sums the trees (leaf values
  pre-scaled by the learning rate, intercept via Targets/
  rescaleConstant — the standard JPMML layout for boosted trees),
  segment 2 turns the raw margin into P(y=1) with a logit
  RegressionModel;
- tree splits: NumpyGBM splits on binned codes ``code <= k`` where
  code = searchsorted(edges, x, 'left'); in value space that is exactly
  ``x <= edges[k]`` (or is-not-missing when k covers every finite bin),
  with NaN always routed right — expressed as SimplePredicate
  lessOrEqual/isNotMissing plus missingValueStrategy="defaultChild".

LightGBM boosters (used when lightgbm is importable) are rejected
explicitly: this container cannot exercise that branch, and an
untested export would be worse than an honest error — dump via
lightgbm's own ``booster_.save_model`` there.

Round-trip coverage: tests/test_pmml.py evaluates the emitted document
with an independent mini PMML scorer and compares probabilities against
NumpyGBM.predict_proba on the same rows, missing values included.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.dom import minidom

from .driver_fit import NumpyGBM

PMML_XMLNS = "http://www.dmg.org/PMML-4_4"


def _el(parent: ET.Element | None, tag: str, **attrs) -> ET.Element:
    attrs = {k: str(v) for k, v in attrs.items()}
    if parent is None:
        return ET.Element(tag, attrs)
    return ET.SubElement(parent, tag, attrs)


def _repr_num(v: float) -> str:
    return repr(float(v))


def _encoder_rows(enc) -> tuple[list[tuple[str, float]], float, float]:
    """(rows, default_for_unseen, map_missing_to) replicating
    operators.model._pandas_encode / the Spark literal-map exprs."""
    from ..operators.woe import LabelEncoder, WOEEncoder

    if isinstance(enc, WOEEncoder):
        rows = [
            (str(k), float(v)) for k, v in enc.woe_map.items() if k != enc.NA
        ]
        return rows, 0.0, float(enc.woe_map.get(enc.NA, 0.0))
    if isinstance(enc, LabelEncoder):
        rows = [(str(v), float(i)) for i, v in enumerate(enc.classes_)]
        mv = float(enc.missing_value)
        return rows, mv, mv
    raise TypeError(f"unsupported encoder {type(enc).__name__}")


def _tree_children(parent: ET.Element, node: dict, edges_for,
                   leaf_scale: float, counter: list[int]) -> None:
    """Collapse a child straight into its parent Node when it is a
    leaf (score on the predicate node), else recurse."""
    if "v" in node:
        parent.set("score", _repr_num(node["v"] * leaf_scale))
        return
    feat_field, edges = edges_for(node["f"])
    nid = counter[0]
    counter[0] += 1
    left = _el(parent, "Node", id=f"{nid}L")
    if node["k"] < len(edges):
        _el(
            left, "SimplePredicate", field=feat_field,
            operator="lessOrEqual", value=_repr_num(edges[node["k"]]),
        )
    else:
        _el(left, "SimplePredicate", field=feat_field, operator="isNotMissing")
    _tree_children(left, node["l"], edges_for, leaf_scale, counter)
    right = _el(parent, "Node", id=f"{nid}R")
    _el(right, "True")
    _tree_children(right, node["r"], edges_for, leaf_scale, counter)
    parent.set("defaultChild", f"{nid}R")


def model_to_pmml(
    model: NumpyGBM, feature_names: list[str], mapper=None,
    target: str = "y", model_name: str = "didtool_spark_gbm",
) -> str:
    """Serialize a fitted NumpyGBM (+ optional fitted FeatureMapper) to
    a PMML 4.4 document string."""
    if not isinstance(model, NumpyGBM):
        raise NotImplementedError(
            "PMML export covers the NumpyGBM booster; a LightGBM booster "
            "serializes natively via model.booster_.save_model()"
        )
    if not model._trees:
        raise ValueError("model is not fitted")
    encoders = dict(getattr(mapper, "encoders", {}) or {})
    enc_of = {f: encoders.get(f) for f in feature_names}

    pmml = _el(None, "PMML", version="4.4", xmlns=PMML_XMLNS)
    header = _el(pmml, "Header")
    _el(header, "Application", name="didtool_spark", version="0.1")

    dd = _el(pmml, "DataDictionary")
    for f in feature_names:
        if enc_of[f] is not None:
            _el(dd, "DataField", name=f, optype="categorical", dataType="string")
        else:
            _el(dd, "DataField", name=f, optype="continuous", dataType="double")
    tf = _el(dd, "DataField", name=target, optype="categorical",
             dataType="integer")
    _el(tf, "Value", value="0")
    _el(tf, "Value", value="1")

    # encoded field names used inside the trees
    def model_field(j: int) -> str:
        f = feature_names[j]
        return f"{f}__enc" if enc_of[f] is not None else f

    if any(e is not None for e in enc_of.values()):
        td = _el(pmml, "TransformationDictionary")
        for f in feature_names:
            if enc_of[f] is None:
                continue
            rows, default, missing_to = _encoder_rows(enc_of[f])
            dfld = _el(td, "DerivedField", name=f"{f}__enc",
                       optype="continuous", dataType="double")
            mv = _el(
                dfld, "MapValues", outputColumn="out",
                defaultValue=_repr_num(default),
                mapMissingTo=_repr_num(missing_to), dataType="double",
            )
            _el(mv, "FieldColumnPair", field=f, column="in")
            it = _el(mv, "InlineTable")
            for raw, out in rows:
                row = _el(it, "row")
                _el(row, "in").text = raw
                _el(row, "out").text = _repr_num(out)

    chain = _el(pmml, "MiningModel", functionName="classification",
                modelName=model_name)
    ms = _el(chain, "MiningSchema")
    for f in feature_names:
        _el(ms, "MiningField", name=f)
    _el(ms, "MiningField", name=target, usageType="target")
    out = _el(chain, "Output")
    _el(out, "OutputField", name="probability(1)", optype="continuous",
        dataType="double", feature="probability", value="1")
    _el(out, "OutputField", name="probability(0)", optype="continuous",
        dataType="double", feature="probability", value="0")
    seg_chain = _el(chain, "Segmentation", multipleModelMethod="modelChain")

    # segment 1: sum of trees + intercept -> rawScore
    s1 = _el(seg_chain, "Segment", id="trees")
    _el(s1, "True")
    mm = _el(s1, "MiningModel", functionName="regression")
    ms1 = _el(mm, "MiningSchema")
    for f in feature_names:
        _el(ms1, "MiningField", name=f)
    out1 = _el(mm, "Output")
    _el(out1, "OutputField", name="rawScore", optype="continuous",
        dataType="double", feature="predictedValue")
    # XSD sequence: Targets must precede the embedded model content
    targets = _el(mm, "Targets")
    _el(targets, "Target", rescaleConstant=_repr_num(model._base))
    seg_sum = _el(mm, "Segmentation", multipleModelMethod="sum")

    def edges_for(j: int):
        return model_field(j), model._qs[j]

    for t, tree in enumerate(model._trees):
        seg = _el(seg_sum, "Segment", id=f"tree_{t}")
        _el(seg, "True")
        tm = _el(
            seg, "TreeModel", functionName="regression",
            splitCharacteristic="binarySplit",
            missingValueStrategy="defaultChild", noTrueChildStrategy="returnLastPrediction",
        )
        ms_t = _el(tm, "MiningSchema")
        for f in feature_names:
            _el(ms_t, "MiningField", name=f)
        root = _el(tm, "Node", id=f"t{t}_root")
        _el(root, "True")
        _tree_children(
            root, tree, edges_for, model.learning_rate, [t * 100000]
        )

    # segment 2: logit(rawScore) -> class probabilities
    s2 = _el(seg_chain, "Segment", id="logit")
    _el(s2, "True")
    rm = _el(s2, "RegressionModel", functionName="classification",
             normalizationMethod="logit")
    ms2 = _el(rm, "MiningSchema")
    _el(ms2, "MiningField", name="rawScore")
    _el(ms2, "MiningField", name=target, usageType="target")
    rt1 = _el(rm, "RegressionTable", intercept="0.0", targetCategory="1")
    _el(rt1, "NumericPredictor", name="rawScore", coefficient="1.0")
    _el(rm, "RegressionTable", intercept="0.0", targetCategory="0")

    raw = ET.tostring(pmml, encoding="unicode")
    return minidom.parseString(raw).toprettyxml(indent="  ")


def export_pmml(
    model: NumpyGBM, feature_names: list[str], path: str, mapper=None,
    target: str = "y", model_name: str = "didtool_spark_gbm",
) -> str:
    """Write ``model_to_pmml`` output to ``path``; returns the path."""
    doc = model_to_pmml(
        model, feature_names, mapper=mapper, target=target,
        model_name=model_name,
    )
    with open(path, "w") as fh:
        fh.write(doc)
    return path
