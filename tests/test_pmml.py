"""PMML export round-trip: the emitted document, scored by an
INDEPENDENT mini PMML evaluator written from the DMG spec, must
reproduce NumpyGBM.predict_proba (and the mapper's pandas encode)
exactly — missing values, unseen categories, and boundary ties
included. No Spark session needed: the exporter serializes driver-side
fit state."""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest

from didtool_spark.functions.driver_fit import NumpyGBM
from didtool_spark.functions.pmml import export_pmml, model_to_pmml

# ------------------------------------------------------------------
# mini evaluator (spec-following, shares no code with the exporter)
# ------------------------------------------------------------------


def _strip_ns(root: ET.Element) -> None:
    for el in root.iter():
        el.tag = el.tag.split("}")[-1]


def _is_missing(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def _eval_predicate(pred: ET.Element, row: dict):
    """True / False / None (= UNKNOWN per the spec)."""
    if pred.tag == "True":
        return True
    assert pred.tag == "SimplePredicate", pred.tag
    v = row.get(pred.get("field"))
    op = pred.get("operator")
    if op == "isNotMissing":
        return not _is_missing(v)
    if op == "isMissing":
        return _is_missing(v)
    if _is_missing(v):
        return None
    x, t = float(v), float(pred.get("value"))
    return {
        "lessOrEqual": x <= t, "lessThan": x < t,
        "greaterThan": x > t, "greaterOrEqual": x >= t,
        "equal": x == t,
    }[op]


def _first_predicate(node: ET.Element) -> ET.Element:
    for child in node:
        if child.tag in ("True", "SimplePredicate"):
            return child
    raise AssertionError("node without predicate")


def _eval_tree(tm: ET.Element, row: dict) -> float:
    node = tm.find("Node")
    while True:
        kids = node.findall("Node")
        if not kids:
            return float(node.get("score"))
        nxt = None
        for kid in kids:
            r = _eval_predicate(_first_predicate(kid), row)
            if r is None:
                default_id = node.get("defaultChild")
                assert default_id, "UNKNOWN predicate without defaultChild"
                nxt = next(k for k in kids if k.get("id") == default_id)
                break
            if r:
                nxt = kid
                break
        assert nxt is not None, "no child matched"
        node = nxt


def _eval_map_values(dfld: ET.Element, row: dict) -> float:
    mv = dfld.find("MapValues")
    field = mv.find("FieldColumnPair").get("field")
    v = row.get(field)
    if _is_missing(v):
        return float(mv.get("mapMissingTo"))
    for r in mv.find("InlineTable").findall("row"):
        if r.find("in").text == str(v):
            return float(r.find("out").text)
    return float(mv.get("defaultValue"))


def evaluate_pmml(doc: str, row: dict) -> dict:
    root = ET.fromstring(doc)
    _strip_ns(root)
    row = dict(row)
    td = root.find("TransformationDictionary")
    if td is not None:
        for dfld in td.findall("DerivedField"):
            row[dfld.get("name")] = _eval_map_values(dfld, row)
    chain = root.find("MiningModel")
    trees_mm = chain.find("Segmentation/Segment/MiningModel")
    raw = 0.0
    for tm in trees_mm.findall("Segmentation/Segment/TreeModel"):
        raw += _eval_tree(tm, row)
    raw += float(trees_mm.find("Targets/Target").get("rescaleConstant"))
    p1 = 1.0 / (1.0 + math.exp(-raw))
    return {"probability(1)": p1, "probability(0)": 1.0 - p1, "rawScore": raw}


# ------------------------------------------------------------------
# fixtures
# ------------------------------------------------------------------


def _numeric_data(n=400, seed=7):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-2, 2, size=(n, 3))
    X[rng.uniform(size=n) < 0.15, 0] = np.nan  # missing in feature 0
    logits = 1.3 * np.nan_to_num(X[:, 0]) - 0.9 * X[:, 1] + 0.2 * X[:, 2]
    y = (logits + rng.normal(scale=0.7, size=n) > 0).astype(float)
    return X, y


class TestNumericRoundTrip:
    def setup_method(self):
        X, y = _numeric_data()
        self.model = NumpyGBM(n_estimators=12, max_depth=3).fit(X, y)
        self.X = X
        self.feats = ["f0", "f1", "f2"]
        self.doc = model_to_pmml(self.model, self.feats)

    def test_probabilities_match_exactly(self):
        want = self.model.predict_proba(self.X)[:, 1]
        for i in range(0, len(self.X), 7):
            row = {
                f: (None if math.isnan(self.X[i, j]) else float(self.X[i, j]))
                for j, f in enumerate(self.feats)
            }
            got = evaluate_pmml(self.doc, row)["probability(1)"]
            assert got == pytest.approx(want[i], abs=1e-10), i

    def test_boundary_tie_goes_left(self):
        # x exactly on a split threshold must route like searchsorted
        # (code <= k <=> x <= edges[k]: ties go LEFT)
        root = ET.fromstring(self.doc)
        _strip_ns(root)
        pred = next(
            p for p in root.iter("SimplePredicate")
            if p.get("operator") == "lessOrEqual"
        )
        f, thr = pred.get("field"), float(pred.get("value"))
        j = self.feats.index(f)
        x = np.zeros((1, 3))
        x[0, j] = thr
        row = {g: float(x[0, k]) for k, g in enumerate(self.feats)}
        got = evaluate_pmml(self.doc, row)["probability(1)"]
        want = self.model.predict_proba(x)[0, 1]
        assert got == pytest.approx(want, abs=1e-10)

    def test_all_missing_row(self):
        row = {f: None for f in self.feats}
        x = np.full((1, 3), np.nan)
        got = evaluate_pmml(self.doc, row)["probability(1)"]
        want = self.model.predict_proba(x)[0, 1]
        assert got == pytest.approx(want, abs=1e-10)

    def test_document_is_wellformed_pmml(self):
        root = ET.fromstring(self.doc)
        assert root.tag.endswith("PMML")
        assert root.get("version") == "4.4"
        _strip_ns(root)
        assert len(root.find("DataDictionary")) == 4  # 3 feats + target
        n_trees = len(
            root.findall(".//Segmentation[@multipleModelMethod='sum']"
                         "/Segment/TreeModel")
        )
        assert n_trees == len(self.model._trees)
        # XSD sequence: in the inner MiningModel, Targets must come
        # BEFORE the Segmentation (schema-validating consumers reject
        # the reverse order)
        inner = root.find("MiningModel/Segmentation/Segment/MiningModel")
        tags = [c.tag for c in inner]
        assert tags.index("Targets") < tags.index("Segmentation")

    def test_unfitted_and_wrong_type_raise(self):
        with pytest.raises(ValueError):
            model_to_pmml(NumpyGBM(), ["a"])
        with pytest.raises(NotImplementedError):
            model_to_pmml(object(), ["a"])


class TestEncodedRoundTrip:
    def _mapper(self):
        """Hand-fitted encoder state (the exporter only reads fit
        attributes, so no Spark needed)."""
        from types import SimpleNamespace

        from didtool_spark.operators.woe import LabelEncoder, WOEEncoder

        woe = WOEEncoder()
        woe.woe_map = {"a": 0.8, "b": -0.4, "c": 0.1, WOEEncoder.NA: -1.2}
        lab = LabelEncoder()
        lab.classes_ = ["x", "y", "z"]
        return SimpleNamespace(encoders={"cat_w": woe, "cat_l": lab, "num": None})

    def test_encoded_pipeline_matches_pandas_encode(self):
        from didtool_spark.operators.model import _pandas_encode

        rng = np.random.RandomState(3)
        n = 300
        pdf = pd.DataFrame({
            "cat_w": rng.choice(["a", "b", "c", None], size=n),
            "cat_l": rng.choice(["x", "y", "z", None], size=n),
            "num": np.where(
                rng.uniform(size=n) < 0.1, np.nan, rng.uniform(-1, 1, n)
            ),
        })
        mapper = self._mapper()
        enc = _pandas_encode(pdf, mapper)
        feats = ["cat_w", "cat_l", "num"]
        y = (
            enc["cat_w"] + 0.5 * enc["num"]
            + rng.normal(scale=0.3, size=n) > 0
        ).astype(float)
        model = NumpyGBM(n_estimators=8, max_depth=2).fit(
            enc[feats].to_numpy(dtype=float), y.to_numpy()
        )
        doc = model_to_pmml(model, feats, mapper=mapper)
        want = model.predict_proba(enc[feats].to_numpy(dtype=float))[:, 1]
        for i in range(0, n, 11):
            row = {
                "cat_w": pdf["cat_w"].iloc[i],
                "cat_l": pdf["cat_l"].iloc[i],
                "num": (
                    None if math.isnan(pdf["num"].iloc[i])
                    else float(pdf["num"].iloc[i])
                ),
            }
            got = evaluate_pmml(doc, row)["probability(1)"]
            assert got == pytest.approx(want[i], abs=1e-10), i

    def test_unseen_category_uses_default(self):
        from didtool_spark.operators.model import _pandas_encode

        mapper = self._mapper()
        pdf = pd.DataFrame(
            {"cat_w": ["a", "b"], "cat_l": ["x", "y"], "num": [0.0, 1.0]}
        )
        enc = _pandas_encode(pdf, mapper)
        feats = ["cat_w", "cat_l", "num"]
        model = NumpyGBM(n_estimators=3, max_depth=1, min_child_samples=1).fit(
            enc[feats].to_numpy(dtype=float), np.array([0.0, 1.0])
        )
        doc = model_to_pmml(model, feats, mapper=mapper)
        # unseen category 'zzz' -> woe default 0.0 / label missing_value
        unseen = pd.DataFrame(
            {"cat_w": ["zzz"], "cat_l": ["zzz"], "num": [0.5]}
        )
        enc_u = _pandas_encode(unseen, mapper)
        want = model.predict_proba(enc_u[feats].to_numpy(dtype=float))[0, 1]
        got = evaluate_pmml(
            doc, {"cat_w": "zzz", "cat_l": "zzz", "num": 0.5}
        )["probability(1)"]
        assert got == pytest.approx(want, abs=1e-10)


def test_export_pmml_writes_file(tmp_path):
    X, y = _numeric_data(n=120)
    model = NumpyGBM(n_estimators=3, max_depth=2).fit(X, y)
    p = export_pmml(model, ["f0", "f1", "f2"], str(tmp_path / "m.pmml"))
    doc = open(p).read()
    assert "<PMML" in doc and "TreeModel" in doc
