"""Function-tail coverage: url/json/base64url/normalize, probability CDFs,
array_sort_desc / array_union / array_normalize, strrpos, concat_ws.

Reference: functions/prestosql/ URLFunctions.h, JsonFunctions.h,
ProbabilityFunctions.cpp, ArrayNormalizeFunction.h — each against a Python
or scipy-free closed-form oracle.
"""

import math

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import DOUBLE, RowType, VARCHAR
from velox_tpu.exec.runner import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.vector.string_table import StringTable


def str_table(values, name="s"):
    tab = StringTable()
    codes = tab.intern_all(values)
    return Table(
        RowType([name], [VARCHAR]),
        {name: np.asarray(codes, np.int32)},
        string_tables={name: tab},
    )


def project_one(t, expr):
    out = run_plan(PlanBuilder().table_scan(t).project([f"{expr} as r"]).build())
    return out.to_pandas()["r"].tolist()


class TestStringTail:
    def test_url_family(self):
        t = str_table(
            [
                "https://example.com:8443/a/b?x=1&y=two#frag",
                "http://host/p?x=%20hi",
                "not a url",
            ],
            "u",
        )
        assert project_one(t, "url_extract_fragment(u)") == ["frag", "", ""]
        assert project_one(t, "url_extract_port(u)") == [8443, -1, -1]
        assert project_one(t, "url_extract_parameter(u, 'y')") == ["two", "", ""]
        assert project_one(t, "url_decode(url_encode(u))") == [
            "https://example.com:8443/a/b?x=1&y=two#frag",
            "http://host/p?x=%20hi",
            "not a url",
        ]

    def test_json_family(self):
        t = str_table(
            ['{"a": [1, 2, 3], "b": {"c": 5}}', '{"a": []}', "nope"], "j"
        )
        assert project_one(t, "json_size(j, '$.a')") == [3, 0, -1]
        assert project_one(t, "json_parse(j)") == [
            '{"a":[1,2,3],"b":{"c":5}}',
            '{"a":[]}',
            "",
        ]

    def test_base64url_normalize_char2hexint(self):
        t = str_table(["hello/world?+", "", "Ω"], "s")
        assert project_one(t, "from_base64url(to_base64url(s))") == [
            "hello/world?+",
            "",
            "Ω",
        ]
        import unicodedata

        src = ["éclair", "abc"]
        t2 = str_table(src, "s")
        assert project_one(t2, "normalize(s)") == [
            unicodedata.normalize("NFC", v) for v in src
        ]
        t3 = str_table(["AB"], "s")
        assert project_one(t3, "char2hexint(s)") == ["00410042"]

    def test_strrpos_and_concat_ws(self):
        t = str_table(["abcabc", "xyz", ""], "s")
        assert project_one(t, "strrpos(s, 'bc')") == [5, 0, 0]
        assert project_one(t, "concat_ws('-', s, 'tail')") == [
            "abcabc-tail",
            "xyz-tail",
            "-tail",
        ]

    def test_levenshtein_distance_literal(self):
        t = str_table(["kitten", "flaw"], "s")
        assert project_one(t, "levenshtein_distance(s, 'sitting')") == [3, 7]


class TestProbability:
    def make(self, vals):
        return Table(
            RowType(["x"], [DOUBLE]), {"x": np.asarray(vals, np.float64)}
        )

    def test_normal_cdf_and_inverse(self):
        t = self.make([0.0, 1.0, -1.96])
        got = project_one(t, "normal_cdf(0.0e0, 1.0e0, x)")
        exp = [0.5 * (1 + math.erf(v / math.sqrt(2))) for v in (0, 1, -1.96)]
        np.testing.assert_allclose(got, exp, rtol=1e-6)
        back = project_one(t, "inverse_normal_cdf(0.0e0, 1.0e0, normal_cdf(0.0e0, 1.0e0, x))")
        np.testing.assert_allclose(back, [0.0, 1.0, -1.96], atol=1e-5)

    def test_discrete_cdfs(self):
        t = self.make([3.0])
        got = project_one(t, "poisson_cdf(2.5e0, x)")
        lam = 2.5
        exp = sum(math.exp(-lam) * lam**k / math.factorial(k) for k in range(4))
        np.testing.assert_allclose(got, [exp], rtol=1e-6)
        got = project_one(t, "binomial_cdf(10.0e0, 0.3e0, x)")
        exp = sum(
            math.comb(10, k) * 0.3**k * 0.7 ** (10 - k) for k in range(4)
        )
        np.testing.assert_allclose(got, [exp], rtol=1e-5)

    def test_continuous_cdfs(self):
        t = self.make([0.7])
        np.testing.assert_allclose(
            project_one(t, "cauchy_cdf(0.0e0, 1.0e0, x)"),
            [math.atan(0.7) / math.pi + 0.5],
            rtol=1e-6,
        )
        # chi2(k=2) has closed form 1 - exp(-x/2)
        np.testing.assert_allclose(
            project_one(t, "chi_squared_cdf(2.0e0, x)"),
            [1 - math.exp(-0.35)],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            project_one(t, "beta_cdf(1.0e0, 1.0e0, x)"), [0.7], rtol=1e-6
        )

    def test_wilson_interval(self):
        t = self.make([1.0])
        lo = project_one(t, "wilson_interval_lower(x * 120, 200.0e0, 1.96e0)")[0]
        hi = project_one(t, "wilson_interval_upper(x * 120, 200.0e0, 1.96e0)")[0]
        p, n, z = 0.6, 200, 1.96
        center = p + z * z / (2 * n)
        margin = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        np.testing.assert_allclose([lo, hi], [(center - margin) / denom, (center + margin) / denom], rtol=1e-6)

    def test_hyperbolic_inverses(self):
        t = self.make([0.5])
        np.testing.assert_allclose(
            project_one(t, "asinh(x)"), [math.asinh(0.5)], rtol=1e-6
        )
        np.testing.assert_allclose(
            project_one(t, "atanh(x)"), [math.atanh(0.5)], rtol=1e-6
        )
        np.testing.assert_allclose(
            project_one(t, "pow(x, 3.0e0)"), [0.125], rtol=1e-6
        )


class TestArrayTail:
    def setup_method(self):
        from velox_tpu.vector.complex import HostSegments

        self.HostSegments = HostSegments

    def arr_table(self, rows, dtype=vt.BIGINT):
        from velox_tpu.dtypes import array as array_t
        from velox_tpu.vector.complex import HostSegments

        seg, _ = HostSegments.from_pylist(rows, array_t(dtype))
        return Table(RowType(["a"], [array_t(dtype)]), {"a": seg})

    def test_array_sort_desc(self):
        t = self.arr_table([[3, 1, 2], [], [5, None, 4]])
        out = run_plan(
            PlanBuilder().table_scan(t).project(["array_sort_desc(a) as r"]).build()
        ).to_pandas()["r"].tolist()
        assert out == [[3, 2, 1], [], [5, 4, None]]

    def test_array_union(self):
        from velox_tpu.dtypes import array as array_t

        at = array_t(vt.BIGINT)
        sa, _ = self.HostSegments.from_pylist([[1, 2], [7]], at)
        sb, _ = self.HostSegments.from_pylist([[2, 3], []], at)
        t = Table(RowType(["a", "b"], [at, at]), {"a": sa, "b": sb})
        out = run_plan(
            PlanBuilder().table_scan(t).project(["array_union(a, b) as r"]).build()
        ).to_pandas()["r"].tolist()
        assert out == [[1, 2, 3], [7]]

    def test_array_normalize(self):
        t = self.arr_table([[3.0, 4.0], [0.0, 0.0], [1.0]], DOUBLE)
        out = run_plan(
            PlanBuilder().table_scan(t).project(["array_normalize(a, 2.0e0) as r"]).build()
        ).to_pandas()["r"].tolist()
        np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
        np.testing.assert_allclose(out[1], [0.0, 0.0])  # zero norm: unchanged
        np.testing.assert_allclose(out[2], [1.0])


class TestWordStemCosine:
    def test_word_stem(self):
        t = str_table(
            ["caresses", "relational", "hopefulness", "sky", "motoring"], "s"
        )
        assert project_one(t, "word_stem(s)") == [
            "caress", "relat", "hope", "sky", "motor"
        ]
        assert project_one(t, "word_stem(s, 'en')")[0] == "caress"

    def test_cosine_similarity(self):
        from velox_tpu.dtypes import map_ as map_t
        from velox_tpu.vector.complex import HostSegments

        mt = map_t(vt.BIGINT, DOUBLE)
        a_rows = [{1: 1.0, 2: 2.0}, {1: 3.0}, {}, {5: 1.0}]
        b_rows = [{1: 1.0, 2: 2.0}, {2: 4.0}, {1: 1.0}, {5: 2.0}]
        sa, _ = HostSegments.from_pylist(a_rows, mt)
        sb, _ = HostSegments.from_pylist(b_rows, mt)
        t = Table(RowType(["a", "b"], [mt, mt]), {"a": sa, "b": sb})
        out = run_plan(
            PlanBuilder()
            .table_scan(t)
            .project(["cosine_similarity(a, b) as c"])
            .build()
        ).to_pandas()["c"].tolist()
        import math

        def oracle(x, y):
            dot = sum(v * y.get(k, 0.0) for k, v in x.items())
            na = math.sqrt(sum(v * v for v in x.values()))
            nb = math.sqrt(sum(v * v for v in y.values()))
            return dot / (na * nb) if na and nb else float("nan")

        for got, (x, y) in zip(out, zip(a_rows, b_rows)):
            exp = oracle(x, y)
            if math.isnan(exp):
                assert math.isnan(got)
            else:
                np.testing.assert_allclose(got, exp, rtol=1e-12)
