"""Federated-learning routes — reference ``backend/app/routes/federated.py``
contract (17 endpoints under /face/fl), backed by the FederatedService
(mesh-sharded FedAvg when devices allow).
"""

from __future__ import annotations

import asyncio

import numpy as np

from frp_tpu.api.http import HTTPError, Request, StreamResponse, json_response
from frp_tpu.ops.fedavg import FedAvgError


def _weights_to_json(weights: dict) -> dict:
    return {k: np.asarray(v).tolist() for k, v in weights.items()}


def register(router, ctx):
    fl = ctx.federated

    @router.post("/face/fl/upload_weights")
    async def upload_weights(request: Request):
        body = request.json() or {}
        client_id = body.get("client_id")
        weights = body.get("weights")
        if not client_id or not isinstance(weights, dict):
            raise HTTPError(422, "'client_id' and 'weights' (dict of layers) required")
        try:
            result = await asyncio.to_thread(fl.upload_weights, client_id, weights)
        except FedAvgError as e:
            raise HTTPError(400, str(e))
        return json_response(result)

    @router.post("/face/fl/aggregate")
    async def aggregate(request: Request):
        body = request.json() or {}
        try:
            result = await asyncio.to_thread(
                fl.aggregate,
                body.get("client_ids"),
                bool(body.get("proportional", False)),
                body.get("min_clients"),
            )
        except FedAvgError as e:
            raise HTTPError(400, str(e))
        return json_response(result)

    @router.get("/face/fl/status")
    async def status(request: Request):
        return json_response(fl.status())

    @router.get("/face/fl/get_weights")
    async def get_weights(request: Request):
        name = request.query.get("client_id") or request.query.get("name")
        if not name:
            return json_response(fl.status())  # alias behavior (federated.py:352-354)
        w = fl.get_weights(name)
        if w is None:
            raise HTTPError(404, f"no weights stored for '{name}'")
        return json_response({"name": name, "weights": _weights_to_json(w)})

    @router.delete("/face/fl/weights/{name}")
    async def delete_weights(request: Request):
        result = fl.delete_weights(request.path_params["name"])
        if not result["success"]:
            raise HTTPError(404, "weights not found")
        return json_response(result)

    @router.get("/face/fl/clients")
    async def clients(request: Request):
        return json_response({"clients": fl.list_clients()})

    @router.post("/face/fl/clients/register")
    async def register_client(request: Request):
        body = request.json() or {}
        client_id = body.get("client_id")
        if not client_id:
            raise HTTPError(422, "'client_id' required")
        return json_response(fl.register_client(client_id, body.get("info")))

    @router.delete("/face/fl/clients/{client_id}")
    async def unregister_client(request: Request):
        result = fl.unregister_client(request.path_params["client_id"])
        if not result["success"]:
            raise HTTPError(404, "client not found")
        return json_response(result)

    @router.get("/face/fl/global_model")
    async def global_model(request: Request):
        version = request.query.get("version")
        got = fl.get_global_model(int(version) if version else None)
        if got is None:
            raise HTTPError(404, "no global model yet — aggregate first")
        name, weights = got
        return json_response(
            {"name": name, "version": int(name.split("v")[-1]),
             "weights": _weights_to_json(weights)}
        )

    @router.get("/face/fl/history")
    async def history(request: Request):
        return json_response({"history": fl.get_history()})

    @router.get("/face/fl/stats")
    async def stats(request: Request):
        return json_response(fl.get_stats())

    @router.get("/face/fl/clients/{client_id}/metrics")
    async def client_metrics(request: Request):
        m = fl.get_client_metrics(request.path_params["client_id"])
        if not m:
            raise HTTPError(404, "no metrics for client")
        return json_response(m)

    @router.post("/face/fl/reset")
    async def reset(request: Request):
        body = request.json() or {}
        if body.get("confirm") != "CONFIRM_RESET":  # federated.py:925-980
            raise HTTPError(400, "pass confirm=CONFIRM_RESET to reset FL state")
        return json_response(fl.reset())

    @router.get("/face/fl/export")
    async def export(request: Request):
        fmt = request.query.get("format", "json")
        data = fl.export()
        if fmt == "csv":
            async def gen():
                yield b"round,version,clients,timestamp\n"
                for h in data["history"]:
                    yield (
                        f"{h['round']},{h['version']},"
                        f"\"{';'.join(h['clients'])}\",{h['timestamp']}\n"
                    ).encode()

            return StreamResponse(gen(), "text/csv")
        return json_response(data)

    @router.get("/face/fl/health")
    async def health(request: Request):
        return json_response(fl.health_check())

    @router.post("/face/fl/round/start")
    async def round_start(request: Request):
        return json_response(fl.start_round())

    @router.get("/face/fl/round/status")
    async def round_status(request: Request):
        return json_response(fl.round_status())

    @router.post("/face/fl/validate")
    async def validate(request: Request):
        body = request.json() or {}
        weights = body.get("weights")
        if not isinstance(weights, dict):
            raise HTTPError(422, "'weights' dict required")
        return json_response(fl.validate_weights(weights))
