"""Model wrappers — the Spark-first re-expression of the reference's
LGBModelSingle / LGBModelStacking (model.py:22-370, 373-704).

Shape: model TRAINING is driver-side over a bounded sample (model state
is inherently driver-sized — the reference trains on a pandas frame
too); everything around it stays distributed DataFrame work — the
encode stage (FeatureMapper, fit on train rows only), scoring
(broadcast model -> Arrow pandas_udf), evaluation metrics (the engine's
rank-statistic auc/ks), and the fold-stacking final-probability math
(scoring.stacking_evaluate).

The booster is LightGBM when importable (the reference's estimator,
verbatim hyperparameters); otherwise functions.driver_fit.NumpyGBM —
same logistic-loss histogram-GBM shape, logloss early stopping,
split-count importances. Behavioral parity is the contract, not
bit-parity of probabilities (documented divergence; the reference's
exact numbers are lightgbm-version-dependent anyway).

PMML export is covered by functions.pmml (a direct PMML 4.4 writer for
the encoders+trees pipeline — the reference's need_pmml/sklearn2pmml
path, model.py:282-304, without the sklearn2pmml dependency);
matplotlib learn-curves stay data-only (importance tables, per-round
losses are exposed; SVG rendering lives in functions.plots).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.driver_fit import NumpyGBM
from .mapper import FeatureMapper
from .metrics import auc as spark_auc, ks as spark_ks
from .scoring import stacking_evaluate, with_score
from .woe import LabelEncoder, WOEEncoder


def _make_booster(params: dict):
    """LGBMClassifier when lightgbm exists (reference estimator), else
    NumpyGBM with the overlapping hyperparameters mapped."""
    try:
        import lightgbm as lgb

        return lgb.LGBMClassifier(**params), True
    except ImportError:
        return (
            NumpyGBM(
                n_estimators=params.get("n_estimators", 100),
                learning_rate=params.get("learning_rate", 0.1),
                max_depth=(
                    params["max_depth"]
                    if params.get("max_depth", -1) and params.get("max_depth", -1) > 0
                    else 3
                ),
                min_child_samples=params.get("min_child_samples", 20),
                reg_lambda=params.get("reg_lambda", 1.0),
                random_state=params.get("random_state", 0),
            ),
            False,
        )


def _fit_booster(params, xt, yt, xv, yv, early_stopping_rounds, verbose=-1):
    model, have_lgb = _make_booster(params)
    if have_lgb:
        import lightgbm as lgb

        model.fit(
            xt, yt, eval_metric="binary_logloss", eval_set=[(xv, yv)],
            callbacks=[lgb.early_stopping(early_stopping_rounds, verbose=False)],
        )
    else:
        model.fit(
            xt, yt, eval_set=(xv, yv),
            early_stopping_rounds=early_stopping_rounds,
        )
    return model


def _sample_pandas(df: DataFrame, cols: list[str], sample_limit: int) -> pd.DataFrame:
    """Bounded driver sample — fraction-sampled above the limit."""
    from ..functions.utils import bounded_sample_pandas

    return bounded_sample_pandas(df.select(*cols), sample_limit)


def _pandas_encode(pdf: pd.DataFrame, mapper: FeatureMapper) -> pd.DataFrame:
    """Apply the fitted mapper's encoders to a pandas batch — the same
    value->code/woe maps the Spark expressions use, so driver-side
    training and distributed scoring see identical features."""
    out = pdf.copy()
    for feat, enc in mapper.encoders.items():
        if enc is None:
            out[feat] = pd.to_numeric(out[feat], errors="coerce")
        elif isinstance(enc, WOEEncoder):
            m = {k: v for k, v in enc.woe_map.items() if k != enc.NA}
            na = enc.woe_map.get(enc.NA, 0.0)
            s = out[feat].map(m)
            s[out[feat].isna()] = na
            out[feat] = s.fillna(0.0).astype(float)
        elif isinstance(enc, LabelEncoder):
            m = {v: i for i, v in enumerate(enc.classes_)}
            out[feat] = (
                out[feat].map(m).fillna(enc.missing_value).astype(float)
            )
    return out


class GBMModelSingle:
    """Reference LGBModelSingle (model.py:22-370): data carries a group
    column (0=train, 1=val, -1=test); mapper fit on train rows only;
    train with logloss early stopping on val; evaluate() appends `prob`
    to every row and reports per-group AUC/KS.

    ``encoders`` plays the role of the reference's auto-built
    ColumnTransformer (woe_features -> WOEEncoder, categorical ->
    label encoder, else passthrough): {feature: 'woe'|'label'|
    'passthrough'}; unspecified features pass through."""

    def __init__(
        self,
        df: DataFrame,
        feature_names: list[str],
        target: str = "target",
        group_col: str = "group",
        model_params: dict | None = None,
        encoders: dict[str, str] | None = None,
        sample_limit: int = 200_000,
    ):
        for col in [target, group_col, *feature_names]:
            if col not in df.columns:
                raise ValueError(f"column `{col}` missing from df")
        self.df = df
        self.feature_names = list(feature_names)
        self.target = target
        self.group_col = group_col
        self.sample_limit = sample_limit
        self._model_params: dict = dict(model_params or {})
        spec = {f: (encoders or {}).get(f, "passthrough") for f in feature_names}
        self.mapper = FeatureMapper(spec)
        self.model = None
        self.importance_df: pd.DataFrame | None = None

    def update_model_params(self, model_params: dict | None):
        if model_params:
            self._model_params.update(model_params)

    def train(self, early_stopping_rounds: int = 20, verbose: int = -1):
        self.mapper.fit(self.df, self.target, self.group_col)
        pdf = _sample_pandas(
            self.df.where(F.col(self.group_col).isin(0, 1)),
            [*self.feature_names, self.target, self.group_col],
            self.sample_limit,
        )
        pdf = _pandas_encode(pdf, self.mapper)
        tr = pdf[pdf[self.group_col] == 0]
        va = pdf[pdf[self.group_col] == 1]
        self.model = _fit_booster(
            self._model_params,
            tr[self.feature_names].to_numpy(dtype=float),
            tr[self.target].to_numpy(dtype=float),
            va[self.feature_names].to_numpy(dtype=float),
            va[self.target].to_numpy(dtype=float),
            early_stopping_rounds,
            verbose,
        )
        self.importance_df = pd.DataFrame(
            {
                "feature": self.feature_names,
                "importance": self.model.feature_importances_,
            }
        ).sort_values("importance", ascending=False)
        return self

    def _predict_fn(self):
        """Picklable (model, mapper-state) -> prob closure for the
        broadcast pandas_udf scorer."""
        model, mapper, feats = self.model, self.mapper, self.feature_names

        def predict(batch: pd.DataFrame):
            enc = _pandas_encode(batch, mapper)
            return model.predict_proba(enc[feats].to_numpy(dtype=float))[:, -1]

        return predict

    def evaluate(self) -> tuple[DataFrame, dict]:
        """Distributed scoring of every row (broadcast model, Arrow
        batches) + per-group AUC/KS via the engine's rank statistics.
        Returns (df without feature columns + `prob`, metrics dict)."""
        scored = with_score(self.df, self._predict_fn(), self.feature_names)
        result = scored.drop(*self.feature_names)
        metrics = {}
        for name, grp in (("train", 0), ("val", 1), ("test", -1)):
            part = result.where(F.col(self.group_col) == grp)
            if part.limit(1).count():
                metrics[f"{name}_auc"] = spark_auc(part, self.target, "prob")
                metrics[f"{name}_ks"] = spark_ks(part, self.target, "prob")
        return result, metrics

    def export(self, out_path: str, model_name: str = "model",
               need_pmml: bool = True) -> dict:
        """Reference model.py:282-304 export: pickles (mapper, model,
        feature_names) as one scoring bundle, writes used_feature.txt
        (importance > 0, original order), feature_list.txt and
        feature_importance.csv, and — need_pmml, like the reference's
        sklearn2pmml call — a PMML 4.4 document of the full
        encoders+trees pipeline (functions.pmml; NumpyGBM boosters
        only, a LightGBM booster saves natively instead). Returns the
        written paths. ``load_model_bundle`` restores a predict closure
        for the broadcast scorer."""
        import os
        import pickle
        import time as _time

        os.makedirs(out_path, exist_ok=True)
        date_str = _time.strftime("%Y%m%d")
        paths = {}
        used = [
            f for f in self.feature_names
            if f in set(
                self.importance_df[self.importance_df.importance > 0].feature
            )
        ]
        paths["used_features"] = os.path.join(out_path, "used_feature.txt")
        with open(paths["used_features"], "w") as fh:
            fh.writelines(c + "\n" for c in used)
        paths["feature_list"] = os.path.join(out_path, "feature_list.txt")
        with open(paths["feature_list"], "w") as fh:
            dtypes = dict(self.df.dtypes)
            fh.writelines(
                f"{c}\t{dtypes.get(c, '')}\n" for c in self.feature_names
            )
        paths["importance"] = os.path.join(out_path, "feature_importance.csv")
        self.importance_df.to_csv(paths["importance"], index=False)
        paths["pkl"] = os.path.join(out_path, f"{model_name}_{date_str}.pkl")
        with open(paths["pkl"], "wb") as fh:
            pickle.dump(
                {
                    "mapper": self.mapper,
                    "model": self.model,
                    "feature_names": self.feature_names,
                },
                fh,
            )
        if need_pmml and isinstance(self.model, NumpyGBM):
            from ..functions.pmml import export_pmml

            paths["pmml"] = export_pmml(
                self.model, self.feature_names,
                os.path.join(out_path, f"{model_name}_{date_str}.pmml"),
                mapper=self.mapper, target=self.target,
                model_name=model_name,
            )
        return paths

    def optimize_model_param(self, searching_space: dict, n_iter: int = 10,
                             seed: int = 0, method: str = "bayes"):
        """Reference model.py:306-370 optimize_model_param: search the
        hyperparameter space maximizing 5-fold CV AUC on the (mapped)
        train rows, then update the params.

        method="bayes" (default, reference-parity): the same GP-UCB
        loop the reference drives through the BayesianOptimization
        package, reimplemented from scratch in numpy (Matern-5/2
        surrogate, UCB kappa=2.576, 5 random init probes —
        functions/bayesopt.py; the package isn't in this runtime).
        method="random": seeded uniform sampling over the same space —
        the cheaper baseline kept from round 2."""
        self.mapper.fit(self.df, self.target, self.group_col)
        pdf = _sample_pandas(
            self.df.where(F.col(self.group_col) == 0),
            [*self.feature_names, self.target],
            self.sample_limit,
        )
        pdf = _pandas_encode(pdf, self.mapper)
        X = pdf[self.feature_names].to_numpy(dtype=float)
        y = pdf[self.target].to_numpy(dtype=float)
        rng = np.random.RandomState(seed)
        int_sets = (
            "n_estimators", "num_leaves", "max_depth", "subsample_for_bin",
            "min_child_samples", "max_bin",
        )

        def cv_auc(params: dict) -> float:
            folds = np.arange(len(y)) % 5
            scores = []
            for k in range(5):
                # plain fit per fold — the reference's cross_val_score
                # runs without early stopping too (model.py:343-346)
                m, _ = _make_booster({**self._model_params, **params})
                m.fit(X[folds != k], y[folds != k])
                p = m.predict_proba(X[folds == k])[:, -1]
                scores.append(_np_auc(y[folds == k], p))
            return float(np.mean(scores))

        def _typed(raw: dict) -> dict:
            return {
                k: int(round(v)) if k in int_sets else float(v)
                for k, v in raw.items()
            }

        if method == "bayes":
            from ..functions.bayesopt import BayesOpt

            bo = BayesOpt(searching_space, seed=seed)
            res = bo.maximize(lambda **kw: cv_auc(_typed(kw)), n_iter=n_iter)
            best_params, best = _typed(res["params"]), res["target"]
        elif method == "random":
            best, best_params = -math.inf, {}
            for _ in range(n_iter):
                cand = _typed(
                    {k: rng.uniform(lo, hi)
                     for k, (lo, hi) in searching_space.items()}
                )
                s = cv_auc(cand)
                if s > best:
                    best, best_params = s, cand
        else:
            raise ValueError(f"unknown search method {method!r}")
        self.update_model_params(best_params)
        return best_params, best


def load_model_bundle(path: str):
    """Restore an exported bundle as a picklable
    ``predict(pandas.DataFrame) -> probs`` closure for
    scoring.with_score (the distributed path) or direct driver use."""
    import pickle

    with open(path, "rb") as fh:
        bundle = pickle.load(fh)
    mapper, model, feats = (
        bundle["mapper"], bundle["model"], bundle["feature_names"]
    )

    def predict(batch: pd.DataFrame):
        enc = _pandas_encode(batch, mapper)
        return model.predict_proba(enc[feats].to_numpy(dtype=float))[:, -1]

    return predict


def _np_auc(y: np.ndarray, p: np.ndarray) -> float:
    """Tie-averaged rank AUC (same statistic as metrics.auc)."""
    ranks = pd.Series(p).rank(method="average").to_numpy()
    n1 = y.sum()
    n0 = len(y) - n1
    if not n1 or not n0:
        return float("nan")
    return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n0 * n1))


class GBMModelStacking:
    """Reference LGBModelStacking (model.py:373-704): group column holds
    fold ids 0..n_fold-1 for train rows and -1 for oot; one model per
    fold trained on the other folds (its own fold is the val set for
    early stopping); evaluate() = own-fold prob for train rows,
    fold-mean for oot (scoring.stacking_evaluate)."""

    def __init__(
        self,
        df: DataFrame,
        feature_names: list[str],
        target: str = "target",
        group_col: str = "group",
        n_fold: int = 5,
        model_params: dict | None = None,
        encoders: dict[str, str] | None = None,
        sample_limit: int = 200_000,
    ):
        self.df = df
        self.feature_names = list(feature_names)
        self.target = target
        self.group_col = group_col
        self.n_fold = n_fold
        self.sample_limit = sample_limit
        self._model_params: dict = dict(model_params or {})
        self._spec = {
            f: (encoders or {}).get(f, "passthrough") for f in feature_names
        }
        self.models: list = []
        self.mappers: list[FeatureMapper] = []
        self.importance_dfs: list[pd.DataFrame] = []

    def update_model_params(self, model_params: dict | None):
        if model_params:
            self._model_params.update(model_params)

    def train(self, early_stopping_rounds: int = 20):
        self.models, self.mappers, self.importance_dfs = [], [], []
        g = F.col(self.group_col)
        pdf = _sample_pandas(
            self.df.where(g >= 0),
            [*self.feature_names, self.target, self.group_col],
            self.sample_limit,
        )
        for k in range(self.n_fold):
            # per-fold mapper fit on that fold's TRAIN rows only
            # (model.py fits each pipeline's mapper per fold)
            mapper = FeatureMapper(self._spec).fit(
                self.df.where((g >= 0) & (g != k)), self.target, group_col=None
            )
            enc = _pandas_encode(pdf, mapper)
            tr = enc[enc[self.group_col] != k]
            va = enc[enc[self.group_col] == k]
            params = {**self._model_params, "random_state": k}
            model = _fit_booster(
                params,
                tr[self.feature_names].to_numpy(dtype=float),
                tr[self.target].to_numpy(dtype=float),
                va[self.feature_names].to_numpy(dtype=float),
                va[self.target].to_numpy(dtype=float),
                early_stopping_rounds,
            )
            self.models.append(model)
            self.mappers.append(mapper)
            self.importance_dfs.append(
                pd.DataFrame(
                    {
                        "feature": self.feature_names,
                        "importance": model.feature_importances_,
                    }
                ).sort_values("importance", ascending=False)
            )
        return self

    def export(self, out_path: str, model_name: str = "model",
               need_pmml: bool = True) -> list[str]:
        """Reference model.py:679-704 per-fold export: one pickled
        (mapper, model, feature_names) bundle per fold, each loadable
        via load_model_bundle, plus — need_pmml, NumpyGBM boosters —
        one PMML document per fold (the reference exports each fold's
        PMMLPipeline the same way)."""
        import os
        import pickle
        import time as _time

        os.makedirs(out_path, exist_ok=True)
        date_str = _time.strftime("%Y%m%d")
        paths = []
        for k, (model, mapper) in enumerate(zip(self.models, self.mappers)):
            p = os.path.join(out_path, f"{model_name}_{k}_{date_str}.pkl")
            with open(p, "wb") as fh:
                pickle.dump(
                    {
                        "mapper": mapper,
                        "model": model,
                        "feature_names": self.feature_names,
                    },
                    fh,
                )
            paths.append(p)
            self.importance_dfs[k].to_csv(
                os.path.join(out_path, f"feature_importance_{k}.csv"),
                index=False,
            )
            if need_pmml and isinstance(model, NumpyGBM):
                from ..functions.pmml import export_pmml

                paths.append(export_pmml(
                    model, self.feature_names,
                    os.path.join(
                        out_path, f"{model_name}_{k}_{date_str}.pmml"
                    ),
                    mapper=mapper, target=self.target,
                    model_name=f"{model_name}_{k}",
                ))
        return paths

    def evaluate(self) -> tuple[DataFrame, pd.DataFrame | None]:
        """Distributed fold-stacking evaluation (model.py:636-704):
        every row scored by every fold model, final prob = own-fold for
        train / fold-mean for oot, plus the per-fold train/val AUC
        table."""
        feats = self.feature_names

        def mk(model, mapper):
            def predict(batch: pd.DataFrame):
                enc = _pandas_encode(batch, mapper)
                return model.predict_proba(enc[feats].to_numpy(dtype=float))[:, -1]

            return predict

        predicts = [mk(m, mp) for m, mp in zip(self.models, self.mappers)]
        return stacking_evaluate(
            self.df, predicts, feats, group_col=self.group_col,
            label_col=self.target,
        )
