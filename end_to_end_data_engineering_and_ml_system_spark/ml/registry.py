"""File-backed experiment tracking + model registry (SURVEY.md §2.11
M10/M11).

The reference drives an MLflow tracking server and model registry
(scripts/train_autoencoder.py:117-269 logs params/metrics/artifacts per
run; scripts/manage_model_registry.py:25-93 finds the latest run,
registers a model version from its artifact, waits for READY, and
transitions it to a stage while archiving prior versions). No MLflow
exists in this container, so this module re-expresses those SEMANTICS over
plain JSON + artifact files — runnable anywhere, no server — with the same
lifecycle verbs:

- ``Tracker.start_run`` / ``Run.log_params`` / ``Run.log_metrics`` /
  ``Run.log_artifact``  (M11: experiment tracking)
- ``ModelRegistry.register``: run artifact -> new model VERSION (monotonic
  int, like MLflow's), immediately READY (files have no async copy step)
- ``ModelRegistry.transition``: move a version to Staging/Production and
  archive whatever held that stage before — the reference's
  transition_model_version_stage(..., archive_existing_versions=True)
- ``ModelRegistry.latest`` / ``load_artifact``: resolve by stage and feed
  the bytes straight into ``serialized_model_inference`` /
  ``batched_inference`` (the swap-in point the M2 docstring promises)

Storage layout (one JSON per run/version, content-addressed artifacts):

    <root>/experiments/<name>/runs/<run_id>/run.json
    <root>/experiments/<name>/runs/<run_id>/artifacts/<artifact_name>
    <root>/models/<model_name>/versions/<N>/version.json
    <root>/models/<model_name>/versions/<N>/artifact

Writes go through write-to-temp + atomic rename, so a crashed writer never
leaves a half-readable version. The root should live on a shared
filesystem in cluster deployments (same contract as scratch.py — only the
DRIVER reads/writes the registry; executors receive model bytes via Spark
broadcast, never by reading these paths).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

STAGES = ("None", "Staging", "Production", "Archived")


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_json(path: str, obj: dict) -> None:
    _atomic_write(path, json.dumps(obj, indent=2, sort_keys=True).encode())


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


@dataclass
class Run:
    """One tracked run: params, metrics (step-indexed history), artifacts."""

    root: str
    experiment: str
    run_id: str

    @property
    def _dir(self) -> str:
        return os.path.join(
            self.root, "experiments", self.experiment, "runs", self.run_id
        )

    def _meta_path(self) -> str:
        return os.path.join(self._dir, "run.json")

    def _meta(self) -> dict:
        return _read_json(self._meta_path())

    def log_params(self, params: dict) -> None:
        m = self._meta()
        m["params"].update({k: str(v) for k, v in params.items()})
        _write_json(self._meta_path(), m)

    def log_metrics(self, metrics: dict, step: int = 0) -> None:
        """Append metric observations; history is kept per metric like the
        reference's per-epoch loss curve (train_autoencoder.py:117-180)."""
        m = self._meta()
        for k, v in metrics.items():
            m["metrics"].setdefault(k, []).append(
                {"step": int(step), "value": float(v)}
            )
        _write_json(self._meta_path(), m)

    def log_artifact(self, name: str, data: bytes) -> str:
        adir = os.path.join(self._dir, "artifacts")
        os.makedirs(adir, exist_ok=True)
        dest = os.path.join(adir, name)
        _atomic_write(dest, data)
        m = self._meta()
        if name not in m["artifacts"]:
            m["artifacts"].append(name)
            _write_json(self._meta_path(), m)
        return dest

    def artifact_bytes(self, name: str) -> bytes:
        with open(os.path.join(self._dir, "artifacts", name), "rb") as f:
            return f.read()

    def end(self, status: str = "FINISHED") -> None:
        m = self._meta()
        m["status"] = status
        m["end_time"] = time.time()
        _write_json(self._meta_path(), m)


class Tracker:
    """M11 experiment tracking over files; run ids are uuid4 hex like
    MLflow's, start_time orders runs for latest-run lookup."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def start_run(self, experiment: str) -> Run:
        run_id = uuid.uuid4().hex
        run = Run(self.root, experiment, run_id)
        os.makedirs(run._dir, exist_ok=True)
        _write_json(
            run._meta_path(),
            {
                "run_id": run_id,
                "experiment": experiment,
                "start_time": time.time(),
                "end_time": None,
                "status": "RUNNING",
                "params": {},
                "metrics": {},
                "artifacts": [],
            },
        )
        return run

    def runs(self, experiment: str) -> list[dict]:
        rdir = os.path.join(self.root, "experiments", experiment, "runs")
        if not os.path.isdir(rdir):
            return []
        out = []
        for rid in os.listdir(rdir):
            p = os.path.join(rdir, rid, "run.json")
            if os.path.isfile(p):
                out.append(_read_json(p))
        return sorted(out, key=lambda m: m["start_time"])

    def find_latest_run_id(self, experiment: str) -> str | None:
        """The reference's latest-run lookup (manage_model_registry.py:25-34:
        search_runs ordered by start_time DESC, max_results=1)."""
        runs = self.runs(experiment)
        return runs[-1]["run_id"] if runs else None

    def get_run(self, experiment: str, run_id: str) -> Run:
        run = Run(self.root, experiment, run_id)
        if not os.path.isfile(run._meta_path()):
            raise FileNotFoundError(f"no run {run_id} in experiment {experiment}")
        return run


class ModelRegistry:
    """M10 model registry over files: monotonically versioned artifacts with
    MLflow-style stage transitions (manage_model_registry.py:58-93)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _model_dir(self, model_name: str) -> str:
        return os.path.join(self.root, "models", model_name)

    def _versions(self, model_name: str) -> list[dict]:
        vdir = os.path.join(self._model_dir(model_name), "versions")
        if not os.path.isdir(vdir):
            return []
        out = []
        for v in os.listdir(vdir):
            p = os.path.join(vdir, v, "version.json")
            if os.path.isfile(p):
                out.append(_read_json(p))
        return sorted(out, key=lambda m: m["version"])

    def register(
        self,
        model_name: str,
        run: Run,
        artifact_name: str,
    ) -> int:
        """Register ``run``'s artifact as the next version of ``model_name``
        (the reference's mlflow.register_model(runs:/<id>/<path>, name) —
        manage_model_registry.py:58-66). Returns the new version number;
        status is READY at once (no async artifact copy to await)."""
        versions = self._versions(model_name)
        version = (versions[-1]["version"] + 1) if versions else 1
        vdir = os.path.join(self._model_dir(model_name), "versions", str(version))
        os.makedirs(vdir, exist_ok=True)
        _atomic_write(
            os.path.join(vdir, "artifact"), run.artifact_bytes(artifact_name)
        )
        _write_json(
            os.path.join(vdir, "version.json"),
            {
                "model": model_name,
                "version": version,
                "source_experiment": run.experiment,
                "source_run_id": run.run_id,
                "source_artifact": artifact_name,
                "stage": "None",
                "status": "READY",
                "created": time.time(),
            },
        )
        return version

    def transition(
        self,
        model_name: str,
        version: int,
        stage: str,
        archive_existing: bool = True,
    ) -> None:
        """Move ``version`` to ``stage``; with ``archive_existing`` every
        other version currently in that stage goes to Archived — the
        reference's transition_model_version_stage(...,
        archive_existing_versions=True) (manage_model_registry.py:84-93)."""
        if stage not in STAGES:
            raise ValueError(f"unknown stage {stage!r}; one of {STAGES}")
        target = None
        for meta in self._versions(model_name):
            if meta["version"] == version:
                target = meta
            elif archive_existing and meta["stage"] == stage != "None":
                meta["stage"] = "Archived"
                self._write_version(model_name, meta)
        if target is None:
            raise FileNotFoundError(f"no version {version} of {model_name}")
        target["stage"] = stage
        self._write_version(model_name, target)

    def _write_version(self, model_name: str, meta: dict) -> None:
        vdir = os.path.join(
            self._model_dir(model_name), "versions", str(meta["version"])
        )
        _write_json(os.path.join(vdir, "version.json"), meta)

    def versions(self, model_name: str) -> list[dict]:
        """All version metadata, ascending — the reference's
        search_model_versions listing."""
        return self._versions(model_name)

    def latest(self, model_name: str, stage: str | None = None) -> dict | None:
        """Newest version overall, or the newest in ``stage`` (the serving
        lookup: latest('m', 'Production') is what a scorer loads)."""
        versions = self._versions(model_name)
        if stage is not None:
            versions = [v for v in versions if v["stage"] == stage]
        return versions[-1] if versions else None

    def load_artifact(self, model_name: str, stage: str = "Production") -> bytes:
        """Model bytes for the newest version in ``stage`` — feed directly to
        serialized_model_inference (ml/pipeline.py), which broadcasts them
        to executors."""
        meta = self.latest(model_name, stage)
        if meta is None:
            raise FileNotFoundError(f"no {model_name} version in stage {stage}")
        p = os.path.join(
            self._model_dir(model_name),
            "versions",
            str(meta["version"]),
            "artifact",
        )
        with open(p, "rb") as f:
            return f.read()


# ---------------------------------------------------------------------------
# HTTP-MLflow swap seam
# ---------------------------------------------------------------------------
#
# Everything in this package consumes the tracker through the FOUR duck-typed
# verbs (start_run -> run.log_params / run.log_metrics(step=) /
# run.log_artifact / run.end) and reads back through runs()/
# find_latest_run_id()/get_run(). A deployment with a real MLflow tracking
# server swaps the file backend by passing an ``MlflowTracker`` anywhere a
# ``Tracker`` is accepted — the trainers (ml/training.py, ml/quality.py)
# only ever touch the run verbs, so no caller changes. The adapter is
# import-gated: this container ships no ``mlflow`` package, so it exists as
# the documented seam plus an interface-parity test
# (tests/test_registry_ml.py); on an environment with MLflow installed it
# talks to the server the reference's own scripts use
# (train_autoencoder.py:117-180, tracking URI from env).


class MlflowRunAdapter:
    """Duck-type twin of ``Run`` over an active ``mlflow`` run."""

    def __init__(self, mlflow_mod, run_id: str):
        self._mlflow = mlflow_mod
        self.run_id = run_id

    def log_params(self, params: dict) -> None:
        self._mlflow.log_params({k: str(v) for k, v in params.items()})

    def log_metrics(self, metrics: dict, step: int = 0) -> None:
        self._mlflow.log_metrics(
            {k: float(v) for k, v in metrics.items()}, step=int(step)
        )

    def log_artifact(self, name: str, data: bytes) -> str:
        import tempfile

        d = tempfile.mkdtemp(prefix="mlflow_artifact_")
        path = os.path.join(d, name)
        with open(path, "wb") as f:
            f.write(data)
        self._mlflow.log_artifact(path)
        return path

    def end(self, status: str = "FINISHED") -> None:
        self._mlflow.end_run(status=status)


class MlflowTracker:
    """``Tracker`` twin over a real MLflow tracking server (import-gated:
    raises ImportError where ``mlflow`` is not installed — this container).
    ``tracking_uri`` is the reference's ``MLFLOW_TRACKING_URI``."""

    def __init__(self, tracking_uri: str):
        import mlflow  # noqa: F401 — hard requirement for this backend

        self._mlflow = mlflow
        mlflow.set_tracking_uri(tracking_uri)

    def start_run(self, experiment: str) -> MlflowRunAdapter:
        self._mlflow.set_experiment(experiment)
        active = self._mlflow.start_run()
        return MlflowRunAdapter(self._mlflow, active.info.run_id)

    def runs(self, experiment: str) -> list[dict]:
        df = self._mlflow.search_runs(
            experiment_names=[experiment], order_by=["start_time ASC"]
        )
        return df.to_dict("records")

    def find_latest_run_id(self, experiment: str) -> str | None:
        df = self._mlflow.search_runs(
            experiment_names=[experiment],
            order_by=["start_time DESC"],
            max_results=1,
        )
        return None if df.empty else df.iloc[0]["run_id"]
