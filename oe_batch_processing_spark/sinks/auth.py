"""Auth / session bootstrap (reference O14, lib/batchProcessing.js:436-525).

Token precedence reproduced exactly:
  1. env ``ACCESS_TOKEN``
  2. login with username/password (+ optional tenantId header) via
     ``POST {app_base_url}/api/users/login`` — token is ``body.id``
  3. explicit ``ctx_access_token`` passed by the caller

The resolved token is fetched once on the driver before the run and carried
into executors via ``RestSinkOptions.access_token`` (broadcast-by-closure) —
no per-record auth traffic.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

# transport(url, method, headers, body) -> (status_code, body_text | error)
LoginTransport = Callable[[str, str, dict, str | None], tuple[int, str | None]]


class AuthError(RuntimeError):
    pass


def _default_login_transport(url, method, headers, body):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url,
        data=body.encode() if body else None,
        method=method,
        headers={"Content-Type": "application/json", **headers},
    )
    try:
        # 30 s login timeout per the reference (lib/batchProcessing.js:472)
        with urllib.request.urlopen(req, timeout=30.0) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode() if e.fp else ""
    except Exception as e:  # noqa: BLE001
        return 0, str(e)


def get_access_token(
    app_base_url: str | None = None,
    username: str | None = None,
    password: str | None = None,
    tenant_id: str | None = None,
    ctx_access_token: str | None = None,
    transport: LoginTransport | None = None,
) -> str | None:
    """Resolve the access token with the reference's precedence."""
    env_token = os.environ.get("ACCESS_TOKEN")
    if env_token:
        return env_token
    if username and password:
        if not app_base_url:
            raise AuthError("app_base_url required for username/password login")
        send = transport or _default_login_transport
        headers = {"tenant_id": tenant_id} if tenant_id else {}
        url = app_base_url.rstrip("/") + "/api/users/login"
        code, body = send(
            url, "POST", headers, json.dumps({"username": username, "password": password})
        )
        if code != 200:
            raise AuthError(f"login failed (HTTP {code}): {body}")
        try:
            token = json.loads(body or "{}").get("id")
        except json.JSONDecodeError as e:
            raise AuthError(f"login response not JSON: {e}") from e
        if not token:
            raise AuthError("login response has no token id")
        return token
    return ctx_access_token
