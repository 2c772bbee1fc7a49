"""GBMModelSingle / GBMModelStacking — the Spark-first re-expression of
reference LGBModelSingle/LGBModelStacking (model.py:22-370, 373-704):
driver-side bounded-sample training, distributed scoring + metrics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from didtool_spark.operators.model import GBMModelSingle, GBMModelStacking
from didtool_spark.operators.split import split_data_random, split_data_stacking


@pytest.fixture(scope="module")
def model_df(spark):
    rng = np.random.RandomState(7)
    n = 4000
    x1 = rng.rand(n)
    x2 = rng.rand(n)
    cat = [f"c{int(v * 4)}" for v in rng.rand(n)]
    y = (
        (x1 * 0.9 + x2 * 0.3 + np.array([int(c[1]) for c in cat]) * 0.05
         + rng.rand(n) * 0.15) > 0.8
    ).astype(int)
    rows = [
        (i, float(a), float(b), c, int(t))
        for i, (a, b, c, t) in enumerate(zip(x1, x2, cat, y))
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, cat string, target int")
    return split_data_random(df, key_cols=["id"], train_size=0.7, val_size=0.15)


def test_gbm_model_single(model_df):
    m = GBMModelSingle(
        model_df, ["x1", "x2", "cat"], target="target",
        model_params={"n_estimators": 60, "learning_rate": 0.15},
        encoders={"cat": "woe"},
    )
    m.train(early_stopping_rounds=10)
    assert m.importance_df is not None
    # the dominant feature wins the importance ranking
    assert m.importance_df.iloc[0]["feature"] == "x1"

    result, metrics = m.evaluate()
    assert "x1" not in result.columns and "prob" in result.columns
    assert result.count() == model_df.count()
    assert metrics["train_auc"] > 0.9
    assert metrics["val_auc"] > 0.85
    assert 0 < metrics["val_ks"] <= 1

    # distributed scoring == driver predict on the same rows
    local = result.where(F.col("id") < 50).select("id", "prob").toPandas()
    src = model_df.where(F.col("id") < 50).toPandas().sort_values("id")
    import didtool_spark.operators.model as mm

    enc = mm._pandas_encode(src, m.mapper)
    expect = m.model.predict_proba(enc[["x1", "x2", "cat"]].to_numpy(dtype=float))[:, -1]
    got = local.sort_values("id")["prob"].to_numpy()
    assert np.allclose(got, expect, atol=1e-12)


def test_gbm_model_single_optimize(model_df):
    m = GBMModelSingle(
        model_df, ["x1", "x2"], target="target",
        model_params={"n_estimators": 20},
    )
    best_params, best_score = m.optimize_model_param(
        {"learning_rate": (0.05, 0.3), "n_estimators": (10, 40)}, n_iter=3
    )
    assert 0.05 <= best_params["learning_rate"] <= 0.3
    assert isinstance(best_params["n_estimators"], int)
    assert best_score > 0.8
    assert m._model_params["learning_rate"] == best_params["learning_rate"]


def test_gbm_model_stacking(model_df):
    df = split_data_stacking(
        model_df.drop("group"), F.col("id") % 10 == 9, n_fold=3, key_cols=["id"]
    )
    m = GBMModelStacking(
        df, ["x1", "x2"], target="target", n_fold=3,
        model_params={"n_estimators": 40, "learning_rate": 0.15},
    )
    m.train(early_stopping_rounds=10)
    assert len(m.models) == 3 and len(m.importance_dfs) == 3

    result, fold_auc = m.evaluate()
    assert result.count() == df.count()
    assert "prob" in result.columns and "x1" not in result.columns
    assert len(fold_auc) == 3
    assert (fold_auc["val_auc"] > 0.8).all()
    # oot rows got the fold-mean
    oot = result.where(F.col("group") == -1)
    row = oot.select("prob", *[f"prob_{k}" for k in range(3)]).first()
    assert abs(row["prob"] - np.mean([row[f"prob_{k}"] for k in range(3)])) < 1e-12


def test_export_and_load_round_trip(model_df, tmp_path_factory):
    """export -> load_model_bundle -> distributed scoring matches the
    in-session model exactly (reference model.py:282-304 export incl.
    the PMML document; its round-trip equivalence is covered in
    tests/test_pmml.py)."""
    import os
    from didtool_spark.operators.model import load_model_bundle
    from didtool_spark.operators.scoring import with_score

    out = str(tmp_path_factory.mktemp("model_export"))
    m = GBMModelSingle(
        model_df, ["x1", "x2"], target="target",
        model_params={"n_estimators": 30},
    ).train(early_stopping_rounds=5)
    paths = m.export(out)
    assert os.path.exists(paths["pkl"])
    assert open(paths["used_features"]).read().strip()
    # NumpyGBM boosters export PMML; LightGBM (if importable) saves
    # natively instead, so only assert the document in that config
    from didtool_spark.functions.driver_fit import NumpyGBM

    if isinstance(m.model, NumpyGBM):
        import xml.etree.ElementTree as ET

        assert ET.parse(paths["pmml"]).getroot().tag.endswith("PMML")
    else:
        assert "pmml" not in paths

    predict = load_model_bundle(paths["pkl"])
    scored = with_score(model_df, predict, ["x1", "x2"]).select("id", "prob")
    direct, _ = m.evaluate()
    a = scored.orderBy("id").toPandas()["prob"].to_numpy()
    b = direct.orderBy("id").toPandas()["prob"].to_numpy()
    import numpy as np

    assert np.allclose(a, b, atol=1e-12)


def test_stacking_export(model_df, tmp_path_factory):
    import os
    from didtool_spark.operators.model import load_model_bundle

    df = split_data_stacking(
        model_df.drop("group"), F.col("id") % 10 == 9, n_fold=2, key_cols=["id"]
    )
    m = GBMModelStacking(
        df, ["x1", "x2"], target="target", n_fold=2,
        model_params={"n_estimators": 15},
    ).train(early_stopping_rounds=5)
    out = str(tmp_path_factory.mktemp("stack_export"))
    paths = m.export(out)
    # per fold: one pkl bundle (+ one PMML document for NumpyGBM)
    from didtool_spark.functions.driver_fit import NumpyGBM

    n_pmml = 2 if isinstance(m.models[0], NumpyGBM) else 0
    assert len(paths) == 2 + n_pmml and all(os.path.exists(p) for p in paths)
    assert sum(p.endswith(".pmml") for p in paths) == n_pmml
    predict = load_model_bundle(paths[0])
    import pandas as pd

    probs = predict(pd.DataFrame({"x1": [0.1, 0.9], "x2": [0.5, 0.5]}))
    assert len(probs) == 2 and all(0 <= p <= 1 for p in probs)
