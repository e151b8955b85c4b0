"""SmartMet HTTP source against a local fixture server."""
import http.server
import json
import threading
import time as timelib

import numpy as np
import pytest

from roadsurf_tpu.io.smartmet import (SmartMetSource, format_smartmet_time,
                                      parse_iso_time)


def utc(s):
    import calendar
    return calendar.timegm(timelib.strptime(s, "%Y-%m-%d %H:%M"))


T0 = utc("2019-12-02 00:00")


def make_rows():
    rows = []
    for sid, lat in ((101, 60.1), (102, 61.2)):
        for k in range(4):
            rows.append({
                "fmisid": sid, "latitude": lat, "longitude": 24.5,
                "time": timelib.strftime("%Y%m%dT%H%M%S",
                                         timelib.gmtime(T0 + 3600 * k)),
                "t2m": -2.0 + k + (sid - 101),
                "rh": 85.0,
                "ws_10min": 3.5,
                "troad": -3.0 + 0.5 * k,
            })
    return rows


class Handler(http.server.BaseHTTPRequestHandler):
    last_path = None

    def do_GET(self):
        Handler.last_path = self.path
        body = json.dumps(make_rows()).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_time_format():
    assert format_smartmet_time(T0) == "20191202T0000"
    assert format_smartmet_time(T0, -10) == "20191201T2350"
    assert parse_iso_time("20191202T010000") == T0 + 3600
    assert parse_iso_time("2019-12-02T01:00:00") == T0 + 3600


def test_smartmet_fetch_and_parse(server):
    sim_t = np.arange(T0, T0 + 3 * 3600 + 1, 1800, dtype=np.int64)
    cfg = {"host": server, "plugin": "timeseries",
           "producer": "observations_fmi", "keyword": "roads",
           "airtemperature": "t2m", "humidity": "rh",
           "windspeed": "ws_10min", "roadtemperature": "troad"}
    src = SmartMetSource(cfg, sim_t)
    sts = src.stations()
    assert [s.point_id for s in sts] == [101, 102]
    s0 = sts[0]
    np.testing.assert_allclose(s0.values["tair"][:3], [-2.0, -1.5, -1.0])
    np.testing.assert_allclose(s0.values["tsurf_obs"][0], -3.0)
    assert "keyword=roads" in Handler.last_path
    assert "producer=observations_fmi" in Handler.last_path
    assert "starttime=20191201T2350" in Handler.last_path


def test_smartmet_fmisid_query(server):
    sim_t = np.arange(T0, T0 + 3600, 1800, dtype=np.int64)
    cfg = {"host": server, "fmisid": [101, 102],
           "airtemperature": "t2m"}
    SmartMetSource(cfg, sim_t)
    assert "fmisid=101%2C102" in Handler.last_path
