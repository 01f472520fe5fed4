"""Offline schema lint for deploy/*.yaml (kubeconform-style).

The sandbox has no cluster and no network, so the K8s posture is
validated structurally: every manifest must parse, carry the required
top-level K8s object fields, and satisfy per-kind invariants that a
real apply would enforce (selector/label agreement, declared probe
ports, valid cron schedules, pinned image tags). This keeps deploy/
from rotting into prose.
"""

from __future__ import annotations

import glob
import os
import re

import yaml

DEPLOY_DIR = os.path.join(os.path.dirname(__file__), "..", "deploy")
DNS1123 = re.compile(r"^[a-z0-9]([-a-z0-9]*[a-z0-9])?$")


def _docs():
    for path in sorted(glob.glob(os.path.join(DEPLOY_DIR, "*.yaml"))):
        with open(path) as f:
            for doc in yaml.safe_load_all(f):
                if doc is not None:
                    yield os.path.basename(path), doc


def test_manifests_exist_and_parse():
    docs = list(_docs())
    assert len(docs) >= 4  # SparkApplication, CronJob, Deployment, Service
    kinds = {d["kind"] for _, d in docs}
    assert {"SparkApplication", "CronJob", "Deployment", "Service"} <= kinds


def test_required_object_fields_and_names():
    for fname, doc in _docs():
        assert doc.get("apiVersion"), f"{fname}: apiVersion missing"
        assert doc.get("kind"), f"{fname}: kind missing"
        name = doc.get("metadata", {}).get("name", "")
        assert DNS1123.match(name), f"{fname}: bad metadata.name {name!r}"
        assert doc["metadata"].get("namespace"), f"{fname}: namespace missing"


def _containers(doc):
    tpl = doc["spec"]["template"]["spec"]
    return tpl.get("containers", [])


def test_pod_templates_have_pinned_images_and_commands():
    for fname, doc in _docs():
        if doc["kind"] == "Deployment":
            pods = [_containers(doc)]
        elif doc["kind"] == "CronJob":
            pods = [
                doc["spec"]["jobTemplate"]["spec"]["template"]["spec"][
                    "containers"
                ]
            ]
        else:
            continue
        for containers in pods:
            assert containers, f"{fname}: no containers"
            for c in containers:
                assert c.get("name") and c.get("image"), f"{fname}: container incomplete"
                image = c["image"]
                assert ":" in image and not image.endswith(":latest"), (
                    f"{fname}: image {image} must pin a non-latest tag"
                )
                assert c.get("command"), f"{fname}: container without command"


def test_deployment_selector_matches_template_labels():
    for fname, doc in _docs():
        if doc["kind"] != "Deployment":
            continue
        sel = doc["spec"]["selector"]["matchLabels"]
        labels = doc["spec"]["template"]["metadata"]["labels"]
        for k, v in sel.items():
            assert labels.get(k) == v, (
                f"{fname}: selector {k}={v} not in template labels {labels}"
            )


def test_probe_and_prometheus_ports_are_declared():
    for fname, doc in _docs():
        if doc["kind"] != "Deployment":
            continue
        meta = doc["spec"]["template"]["metadata"]
        for c in _containers(doc):
            declared = {p.get("name") for p in c.get("ports", [])} | {
                p.get("containerPort") for p in c.get("ports", [])
            }
            for probe in ("readinessProbe", "livenessProbe"):
                if probe in c:
                    port = c[probe]["httpGet"]["port"]
                    assert port in declared, (
                        f"{fname}: {probe} port {port} not declared"
                    )
            ann = meta.get("annotations", {})
            if ann.get("prometheus.io/scrape") == "true":
                assert ann.get("prometheus.io/path") == "/metrics"
                scrape_port = int(ann["prometheus.io/port"])
                nums = {
                    p.get("containerPort") for p in c.get("ports", [])
                }
                assert scrape_port in nums, (
                    f"{fname}: scrape port {scrape_port} not a containerPort"
                )


def test_cronjob_schedule_is_valid_cron():
    field_ranges = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]
    for fname, doc in _docs():
        if doc["kind"] != "CronJob":
            continue
        fields = doc["spec"]["schedule"].split()
        assert len(fields) == 5, f"{fname}: schedule needs 5 fields"
        for spec, (lo, hi) in zip(fields, field_ranges):
            for part in spec.split(","):
                part = part.split("/")[0]
                if part in ("*", ""):
                    continue
                for v in part.split("-"):
                    assert lo <= int(v) <= hi, (
                        f"{fname}: cron field {spec} out of range"
                    )


def test_service_targets_existing_deployment_port():
    deployments = {}
    services = []
    for fname, doc in _docs():
        if doc["kind"] == "Deployment":
            deployments[doc["metadata"]["name"]] = doc
        elif doc["kind"] == "Service":
            services.append((fname, doc))
    for fname, svc in services:
        sel = svc["spec"]["selector"]
        matches = [
            d
            for d in deployments.values()
            if all(
                d["spec"]["template"]["metadata"]["labels"].get(k) == v
                for k, v in sel.items()
            )
        ]
        assert matches, f"{fname}: service selector matches no deployment"
        port_names = {
            p.get("name")
            for d in matches
            for c in _containers(d)
            for p in c.get("ports", [])
        }
        for p in svc["spec"]["ports"]:
            tp = p.get("targetPort")
            if isinstance(tp, str):
                assert tp in port_names, f"{fname}: targetPort {tp} undeclared"


def test_sparkapplication_core_fields():
    for fname, doc in _docs():
        if doc["kind"] != "SparkApplication":
            continue
        spec = doc["spec"]
        for key in ("type", "mode", "image", "mainApplicationFile", "sparkVersion"):
            assert spec.get(key), f"{fname}: spec.{key} missing"
        assert "executor" in spec and "driver" in spec
        assert spec["dynamicAllocation"]["maxExecutors"] >= 100  # scale posture


def test_compose_dev_mode_parses_and_probes_status():
    """deploy/docker-compose.yml mirrors the reference's dev-mode
    compose (single facade, /status healthcheck); .yml keeps it out of
    the K8s lint's *.yaml glob."""
    path = os.path.join(DEPLOY_DIR, "docker-compose.yml")
    with open(path) as f:
        doc = yaml.safe_load(f)
    svc = doc["services"]["barco-facade"]
    assert "run_facade.py" in " ".join(svc["command"])
    assert any("/status" in str(part) for part in svc["healthcheck"]["test"])
    assert any("9250" in p for p in svc["ports"])
    env = dict(e.split("=", 1) for e in svc["environment"])
    assert env["FACADE_PORT"] == "9250"


def test_facade_dockerfile_ships_package_and_entrypoint():
    path = os.path.join(DEPLOY_DIR, "Dockerfile")
    text = open(path).read()
    assert "COPY barco_spark" in text
    assert "run_facade.py" in text
    assert "PYTHONPATH=/opt/barco" in text
    # the deployment must run the image this Dockerfile builds
    dep = open(os.path.join(DEPLOY_DIR, "facade-deployment.yaml")).read()
    assert "barco-spark:" in dep and "run_facade.py" in dep
