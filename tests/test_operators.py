"""Unit tests for library operators on tiny literal DataFrames
(SURVEY.md §5 t2: edge cases the driver tables can't exercise)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_scripts_showcase__spark.operators import dedup as DD
from data_etl_scripts_showcase__spark.operators import multimodal as MM
from data_etl_scripts_showcase__spark.operators import similarity as SIM
from data_etl_scripts_showcase__spark.operators import text as TX


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def one_value(df):
    return df.collect()[0][0]


class TestTextOps:
    def test_tokens_normalize(self, spark):
        d = docs(spark, [(1, "  Hello   WORLD  ")])
        assert one_value(d.select(TX.tokens("text"))) == ["hello", "world"]

    def test_empty_text_ratios_are_zero(self, spark):
        d = docs(spark, [(1, "")])
        row = d.select(
            TX.punct_ratio("text").alias("p"),
            TX.stopword_ratio("text").alias("s"),
            TX.mean_token_len("text").alias("m"),
        ).collect()[0]
        assert row.p == 0.0 and row.s == 0.0 and row.m == 0.0

    def test_language_id_markers(self, spark):
        d = docs(
            spark,
            [
                (1, "le chat et les chiens des villes"),
                (2, "the cat and the dog of the town"),
                (3, "xyzzy qwerty plugh"),
            ],
        )
        out = {
            r.doc_id: r.lang
            for r in d.select("doc_id", TX.language_id("text").alias("lang")).collect()
        }
        assert out == {1: "fr", 2: "en", 3: "und"}

    def test_language_id_tie_breaks_alphabetically(self, spark):
        # 'le' is a marker for both fr and zh (1 hit each) → 'fr' < 'zh'
        d = docs(spark, [(1, "le xyzzy")])
        assert one_value(d.select(TX.language_id("text"))) == "fr"

    def test_fingerprint_invariant_to_case_and_whitespace(self, spark):
        d = docs(spark, [(1, "Hello  World"), (2, "hello world")])
        fps = [r[0] for r in d.select(TX.fingerprint_md5("text")).collect()]
        assert fps[0] == fps[1]


class TestDedupOps:
    def test_word_ngrams_short_doc_is_empty(self, spark):
        # guards the sequence(1,0)-descends pitfall
        d = docs(spark, [(1, "only two")])
        assert one_value(d.select(DD.word_ngrams("text"))) == []

    def test_word_ngrams_exact(self, spark):
        d = docs(spark, [(1, "a b c d")])
        assert one_value(d.select(DD.word_ngrams("text"))) == ["a b c", "b c d"]

    def test_exact_dedup_groups(self, spark):
        d = docs(spark, [(1, "Same  Text"), (2, "same text"), (3, "other")])
        out = DD.exact_dedup(d, "doc_id", "text").collect()
        by_count = {r.dup_count: r for r in out}
        assert by_count[2].rep_id == 1 and by_count[1].rep_id == 3

    def test_jaccard_bounds(self, spark):
        df = spark.createDataFrame(
            [(["a", "b"], ["a", "b"]), (["a"], ["b"]), ([], [])],
            "x array<string>, y array<string>",
        )
        vals = [r[0] for r in df.select(DD.jaccard(F.col("x"), F.col("y"))).collect()]
        assert vals == [1.0, 0.0, 0.0]

    def test_identical_docs_share_signature_and_pair(self, spark):
        text = "the quick brown fox jumps over the lazy dog again and again"
        d = docs(spark, [(1, text), (2, text), (3, "completely different words here")])
        sig = DD.minhash_signature(d, "doc_id", "text")
        rows = {r.doc_id: [r[f"mh{i}"] for i in range(DD.N_SEEDS)] for r in sig.collect()}
        assert rows[1] == rows[2] and rows[1] != rows[3]
        pairs = DD.candidate_pairs(DD.lsh_buckets(sig, "doc_id"), "doc_id").collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}

    def test_hot_bucket_cap_blocks_quadratic_pairs(self, spark):
        """Adversarial hot bucket: 40 identical boilerplate docs all land in
        the same (band, bucket) and would emit 40·39/2 = 780 pairs; with the
        cap they emit none, two genuinely-similar docs still pair, and
        oversized_buckets accounts for every skipped id."""
        boiler = "click here to unsubscribe from this mailing list today please"
        near = "the quick brown fox jumps over the lazy dog again and again"
        rows = [(i, boiler) for i in range(40)] + [(100, near), (101, near)]
        d = docs(spark, rows)
        sig = DD.minhash_signature(d, "doc_id", "text")
        buckets = DD.lsh_buckets(sig, "doc_id")

        uncapped = DD.candidate_pairs(buckets, "doc_id").count()
        assert uncapped == 40 * 39 // 2 + 1

        capped = DD.candidate_pairs(buckets, "doc_id", max_bucket_size=10)
        assert {(r.id_a, r.id_b) for r in capped.collect()} == {(100, 101)}

        dropped = DD.oversized_buckets(buckets, max_bucket_size=10).collect()
        assert dropped and all(r.n_ids == 40 for r in dropped)
        # every band of the boilerplate signature is one hot bucket
        assert len(dropped) == DD.N_BANDS

    def test_simhash_identical_and_hamming(self, spark):
        text = "one two three four five six seven eight"
        d = docs(spark, [(1, text), (2, text)])
        out = {r.doc_id: r.simhash for r in DD.simhash32(d, "doc_id", "text").collect()}
        assert out[1] == out[2]
        assert 0 <= out[1] < 2**32
        ham = spark.createDataFrame([(out[1], out[2])], "a bigint, b bigint").select(
            DD.hamming32(F.col("a"), F.col("b"))
        )
        assert one_value(ham) == 0


class TestSimilarityOps:
    def test_cosine_identity_and_orthogonal(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
            "a array<float>, b array<float>",
        )
        vals = [r[0] for r in df.select(SIM.cosine("a", "b")).collect()]
        assert vals[0] == pytest.approx(1.0)
        assert vals[1] == pytest.approx(0.0)
        assert vals[2] == 0.0  # zero-norm guard

    def test_knn_excludes_self_and_ranks(self, spark):
        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.9, 0.1]),
                (3, [0.0, 1.0]),
                (4, [1.0, 0.01]),
            ],
            "vec_id bigint, embedding array<float>",
        )
        out = SIM.knn_bruteforce(vecs.where("vec_id = 1"), vecs, k=2).collect()
        assert [r.neighbor_id for r in out] == [4, 2]
        assert all(r.query_id == 1 for r in out)

    def test_sign_bucket_blocks(self, spark):
        vecs = spark.createDataFrame(
            [(1, [1.0, 1.0]), (2, [1.0, 1.0]), (3, [-1.0, -1.0])],
            "vec_id bigint, embedding array<float>",
        )
        b = vecs.select(SIM.sign_bucket("embedding", 2).alias("b")).collect()
        assert b[0].b == b[1].b != b[2].b


class TestMultimodalOps:
    def test_decode_real_is_stubbed(self):
        with pytest.raises(NotImplementedError):
            MM.decode_real(b"bytes", "image")

    def test_feature_stage_deterministic(self, spark):
        d = docs(spark, [(0, "abc"), (1, "0123456789" * 5)])
        out = {
            r.asset_id: r
            for r in MM.extract_features(MM.to_assets(d, "doc_id", "text")).collect()
        }
        import hashlib

        assert out[0].media_type == "image" and out[1].media_type == "audio"
        assert out[0].byte_len == 3 and out[1].byte_len == 50
        assert out[0].checksum == hashlib.md5(b"abc").hexdigest()
        assert out[0].width == 16 + 3 % 624
        assert out[1].n_frames == 1 + 50 % 32
        assert out[1].sampled_frames == list(
            range(0, out[1].n_frames, max(1, (out[1].n_frames + 3) // 4))
        )
        assert len(out[1].sampled_frames) <= 4


class TestIVF:
    def test_ivf_cells_partition_the_corpus(self, spark):
        """IVF build invariant: every corpus vector lands in exactly one cell
        (cells are a partition of the corpus, so probes never double-count)."""
        from data_etl_scripts_showcase__spark.operators.similarity import (
            assign_cells,
        )
        from data_etl_scripts_showcase__spark.sources import load_table
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cent_vec"),
        )
        cells = assign_cells(e, cents, 1)
        assert cells.count() == e.count()
        assert cells.select("vec_id").distinct().count() == e.count()

    def test_assign_cells_matches_scalar_reference(self, spark):
        """The vectorized (numpy-matmul mapInPandas) assignment must rank
        cells exactly like the scalar definition: cosine in doubles,
        rounded to 6 dp HALF AWAY FROM ZERO (the F.round/DuckDB mode the
        similarity family's oracles use — NOT Python/numpy half-to-even,
        ADVICE r8), ties broken by ascending centroid id.  Pure-python
        reference over the real sf0.001 corpus, n_assign=2 so tie-break
        order inside the top-k is exercised too."""
        import math

        from data_etl_scripts_showcase__spark.operators.similarity import (
            assign_cells,
        )
        from data_etl_scripts_showcase__spark.sources import load_table
        from pyspark.sql import functions as F

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        cents = e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("cent_vec"),
        )
        cent_rows = sorted(
            (r.centroid_id, [float(x) for x in r.cent_vec])
            for r in cents.collect()
        )

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return 0.0 if na == 0.0 or nb == 0.0 else dot / (na * nb)

        def round_away(x, r=6):
            p = 10.0 ** r
            return math.copysign(math.floor(abs(x) * p + 0.5), x) / p

        expected = {}
        for r in e.collect():
            v = [float(x) for x in r.embedding]
            ranked = sorted(
                ((-round_away(cos(v, cv)), cid) for cid, cv in cent_rows)
            )
            expected[r.vec_id] = [cid for _, cid in ranked[:2]]

        got = {}
        for row in assign_cells(e, cents, 2).collect():
            got.setdefault(row.vec_id, {})[row.cell_rank] = row.cell
        assert set(got) == set(expected)
        mismatches = [
            (vid, [g[1], g[2]], expected[vid])
            for vid, g in got.items()
            if [g[1], g[2]] != expected[vid]
        ]
        assert not mismatches, mismatches[:5]

    def test_assign_cells_quarantines_malformed_vectors(self, spark):
        """Null and wrong-dimension vectors come back with cell/cell_rank
        NULL (quarantined — visible, never ranked), valid vectors are
        unaffected by their presence in the same batch, and a zero-NORM
        vector of the right dim still gets a defined assignment (sim 0 to
        every centroid, ranked by ascending centroid id).  VERDICT r8 #2."""
        from data_etl_scripts_showcase__spark.operators.similarity import (
            assign_cells,
        )

        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),   # aligned with centroid 0
            (1, [0.0, 1.0, 0.0, 0.0]),   # aligned with centroid 1
            (2, None),                   # null vector -> quarantined
            (3, [1.0, 0.0]),             # wrong dim  -> quarantined
            (4, [0.0, 0.0, 0.0, 0.0]),   # zero norm  -> sim 0, cid-asc rank
            (5, [1.0, 0.0, 0.0, 0.0, 9.0]),  # too long -> quarantined
        ]
        e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
            "centroid_id bigint, cent_vec array<double>",
        )
        got = {
            (r.vec_id, r.cell_rank): r.cell
            for r in assign_cells(e, cents, 2).collect()
        }
        # valid vectors: full top-2, nearest first
        assert got[(0, 1)] == 0 and got[(0, 2)] == 1
        assert got[(1, 1)] == 1 and got[(1, 2)] == 0
        # zero-norm: all sims 0, deterministic ascending-centroid-id order
        assert got[(4, 1)] == 0 and got[(4, 2)] == 1
        # malformed: exactly one row each, cell and rank both NULL
        assert got[(2, None)] is None
        assert got[(3, None)] is None
        assert got[(5, None)] is None
        assert len(got) == 9  # 3 valid x 2 ranks + 3 quarantined singletons

    def test_ivf_neighbors_subset_of_bruteforce_pool(self, spark):
        """IVF returns real corpus neighbors with valid sims (recall vs the
        exact baseline is the standard ANN trade — structure is what we pin)."""
        from data_etl_scripts_showcase__spark.queries import load_all

        got = load_all()["v4_knn_ivf"].fn(spark, "/root/testdata/sf0.001")
        rows = got.collect()
        assert rows, "IVF probe returned nothing"
        assert all(-1.0 <= r.sim <= 1.0 and r.rank <= 3 for r in rows)


class TestAsofJoin:
    def test_asof_semantics_edges(self, spark):
        """At-or-before matching: equal-ts matches, pre-first-right is null,
        later rights never leak backward, keys don't cross."""
        from data_etl_scripts_showcase__spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 10, "l1"), (1, 20, "l2"), (1, 35, "l3"), (2, 5, "l4")],
            "k bigint, ts bigint, tag string",
        )
        right = spark.createDataFrame(
            [(1, 20, 200.0), (1, 30, 300.0), (2, 50, 500.0)],
            "k bigint, ts bigint, v double",
        )
        got = {
            r.tag: r.v
            for r in asof_join(left, right, on="ts", by=["k"]).collect()
        }
        assert got == {
            "l1": None,   # before any right row for k=1
            "l2": 200.0,  # equal ts counts (>= semantics)
            "l3": 300.0,  # latest at-or-before 35
            "l4": None,   # k=2's only right row is later
        }

    def test_asof_name_collision_suffix(self, spark):
        """A right value column that collides with a left name is suffixed."""
        from data_etl_scripts_showcase__spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10, 1.0)], "k bigint, ts bigint, v double")
        right = spark.createDataFrame([(1, 5, 9.0)], "k bigint, ts bigint, v double")
        out = asof_join(left, right, on="ts", by=["k"])
        assert "v_asof" in out.columns and "v" in out.columns
        row = out.collect()[0]
        assert row.v == 1.0 and row.v_asof == 9.0


class TestIntervalJoin:
    def test_boundaries_inclusive_and_keys_isolated(self, spark):
        from data_etl_scripts_showcase__spark.operators.rangejoin import (
            interval_join,
        )

        points = spark.createDataFrame(
            [(1, 100, "in-lo"), (1, 200, "in-hi"), (1, 99, "below"),
             (1, 201, "above"), (2, 150, "wrong-key")],
            "k bigint, ts bigint, tag string",
        )
        ivs = spark.createDataFrame(
            [(1, 100, 200, "w1")], "k bigint, lo bigint, hi bigint, wid string"
        )
        got = sorted(
            r.tag
            for r in interval_join(
                points, ivs, "ts", "lo", "hi", by=["k"], bucket_seconds=7
            ).collect()
        )
        assert got == ["in-hi", "in-lo"]

    def test_interval_spanning_many_buckets(self, spark):
        """A wide interval explodes across buckets but each contained point
        matches exactly once (no dup pairs)."""
        from data_etl_scripts_showcase__spark.operators.rangejoin import (
            interval_join,
        )

        points = spark.createDataFrame(
            [(1, t, f"p{t}") for t in range(0, 1000, 100)],
            "k bigint, ts bigint, tag string",
        )
        ivs = spark.createDataFrame(
            [(1, 0, 1000, "wide")], "k bigint, lo bigint, hi bigint, wid string"
        )
        out = interval_join(points, ivs, "ts", "lo", "hi", ["k"], bucket_seconds=3)
        assert out.count() == 10
        assert out.select("tag").distinct().count() == 10

    def test_bucket_exact_floor_full_int64_range(self, spark):
        """Bucketing is exact floor division over the ENTIRE int64 range.

        ``floor(x / y)`` in double is exact only below 2^53; above it a
        bucket boundary can round to the wrong side, and a mis-bucketed
        point is a silently DROPPED match (the containment refilter can
        only discard false positives).  Pins _floor_div_exact against
        Python's arbitrary-precision ``//`` at adversarial boundary
        values: +/-1 around multiples of the bucket width, at 2^53 and
        out to the int64 edges, negatives included.
        """
        from data_etl_scripts_showcase__spark.operators.rangejoin import (
            _floor_div_exact,
        )

        y = 900
        anchors = [
            0, 1, 899, 900, 2**31, 2**53 - 1, 2**53, 2**53 + 1,
            (2**53 // y) * y, (2**60 // y) * y, 2**62, 2**63 - 2,
        ]
        vals = set()
        for a in anchors:
            for d in (-1, 0, 1):
                for s in (1, -1):
                    v = s * (a + d)
                    if -(2**63) <= v <= 2**63 - 1:
                        vals.add(v)
        rows = [(v,) for v in sorted(vals)]
        df = spark.createDataFrame(rows, "x bigint")
        got = {
            r.x: r.b
            for r in df.select(
                "x", _floor_div_exact(F.col("x"), y).alias("b")
            ).collect()
        }
        for v in sorted(vals):
            assert got[v] == v // y, (v, got[v], v // y)


class TestCodecSeam:
    """The real-codec seam (VERDICT r4 #7): one test, runs EITHER way.

    Without PIL: decode_real raises NotImplementedError and the stub stage
    keeps producing features.  With PIL: decode_real returns the true
    dimensions of a genuine image and the mapInPandas real stage yields
    the same schema as the stub — so the seam is verified wherever the
    runtime dependency exists, and its absence is a documented fallback,
    not a silent skip."""

    def test_seam_runs_with_or_without_pil(self, spark):
        payload = b"not-an-image-payload"
        if not MM.pil_available():
            with pytest.raises(NotImplementedError, match="PIL"):
                MM.decode_real(payload, "image")
            # audio/video raise regardless of PIL (need soundfile/ffmpeg)
            with pytest.raises(NotImplementedError, match="soundfile"):
                MM.decode_real(payload, "audio")
            # stub fallback still produces the full feature schema
            assets = MM.to_assets(
                docs(spark, [(1, "alpha"), (2, "beta")]), "doc_id", "text"
            )
            rows = MM.extract_features(assets).collect()
            assert len(rows) == 2 and all(r.width >= 16 for r in rows)
            return

        # PIL available: a genuine in-memory image must decode to its
        # true dimensions through both the scalar seam and the Arrow stage
        import io as _io

        from PIL import Image

        buf = _io.BytesIO()
        Image.new("RGB", (37, 21)).save(buf, format="PNG")
        png = buf.getvalue()
        assert MM.decode_real(png, "image") == (37, 21, 1)

        assets = (
            spark.createDataFrame(
                [(1, "image", bytearray(png), len(png))],
                "asset_id bigint, media_type string, content binary, "
                "declared_len int",
            )
        )
        real = MM.extract_features(assets, use_real_codec=True).collect()
        assert [(r.width, r.height, r.n_frames) for r in real] == [(37, 21, 1)]
        stub = MM.extract_features(assets).collect()
        assert stub[0].checksum == real[0].checksum  # same bytes, same id
        assert stub[0].byte_len == real[0].byte_len

    @staticmethod
    def _wav_bytes(channels: int, rate: int, n_frames: int) -> bytes:
        """A genuine PCM WAV built with the stdlib — no codec libs needed."""
        import io as _io
        import struct
        import wave

        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(
                b"".join(
                    struct.pack("<h", (i * 37) % 32767) * channels
                    for i in range(n_frames)
                )
            )
        return buf.getvalue()

    def test_audio_seam_decodes_real_wav(self, spark):
        """VERDICT r5 #7: the audio half of the codec seam.  PCM WAV
        decodes to its TRUE (channels, sample_rate, n_frames) through the
        stdlib ``wave`` fallback even where soundfile is absent — real
        audio metadata in this container, not a stub; soundfile remains
        the preferred import-guarded path for other formats.  The real
        mapInPandas stage yields the same schema as the stub on the same
        payload."""
        wav = self._wav_bytes(2, 16000, 1234)
        assert MM.decode_real(wav, "audio") == (2, 16000, 1234)

        assets = spark.createDataFrame(
            [(7, "audio", bytearray(wav), len(wav))],
            "asset_id bigint, media_type string, content binary, "
            "declared_len int",
        )
        real = MM.extract_features(assets, use_real_codec=True).collect()
        assert [(r.width, r.height, r.n_frames) for r in real] == [
            (2, 16000, 1234)
        ]
        stub = MM.extract_features(assets).collect()
        assert stub[0].checksum == real[0].checksum
        assert stub[0].byte_len == real[0].byte_len
        # non-WAV bytes reach the SAME documented raise whether or not
        # soundfile is importable (ADVICE r6: soundfile decode errors now
        # fall through to the wave parser / NotImplementedError path)
        with pytest.raises(NotImplementedError, match="soundfile"):
            MM.decode_real(b"\x00\x01garbage", "audio")
        # compressed video remains the ffmpeg seam either way
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            MM.decode_real(wav, "video")

    def test_video_seam_decodes_real_y4m(self, spark):
        """VERDICT r6 missing #3: the video third of the codec seam.
        Uncompressed YUV4MPEG2 parses with the stdlib alone — true
        (width, height, n_frames) from a real container format, frame
        markers and plane sizes validated — so video has a real-path
        test in this runtime too; compressed containers still raise the
        documented ffmpeg seam."""
        w, h, n = 4, 4, 3
        frame = b"FRAME\n" + bytes(w * h * 3 // 2)
        y4m = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n" + frame * n
        assert MM.decode_real(y4m, "video") == (w, h, n)
        # 422/444/mono plane math
        assert MM.decode_real(
            b"YUV4MPEG2 W2 H2 C444\n" + (b"FRAME\n" + bytes(12)) * 2, "video"
        ) == (2, 2, 2)
        assert MM.decode_real(
            b"YUV4MPEG2 W2 H2 Cmono\n" + b"FRAME\n" + bytes(4), "video"
        ) == (2, 2, 1)

        assets = spark.createDataFrame(
            [(9, "video", bytearray(y4m), len(y4m))],
            "asset_id bigint, media_type string, content binary, "
            "declared_len int",
        )
        real = MM.extract_features(assets, use_real_codec=True).collect()
        assert [(r.width, r.height, r.n_frames) for r in real] == [(w, h, n)]
        stub = MM.extract_features(assets).collect()
        assert stub[0].checksum == real[0].checksum

        # corrupt streams raise the SAME documented contract: truncated
        # frame payload, bad frame marker, missing dimensions
        with pytest.raises(NotImplementedError, match="y4m"):
            MM.decode_real(y4m[: len(y4m) - 4], "video")
        with pytest.raises(NotImplementedError, match="y4m"):
            MM.decode_real(b"YUV4MPEG2 W4 H4 C420\nJUNK\n", "video")
        with pytest.raises(NotImplementedError, match="y4m"):
            MM.decode_real(b"YUV4MPEG2 F25:1\nFRAME\n", "video")


class TestResizePlan:
    def test_resize_invariants(self, spark):
        """Aspect-preserving, never upscales, long edge fits the box."""
        payloads = [(i, "x" * (7 + i * 131)) for i in range(1, 40, 3)]
        assets = MM.to_assets(docs(spark, payloads), "doc_id", "text")
        # force everything to image so every row gets a plan
        assets = assets.withColumn("media_type", F.lit("image"))
        rows = MM.plan_resizes(assets).collect()
        assert rows
        for r in rows:
            long_in = max(r.src_w, r.src_h)
            long_out = max(r.out_w, r.out_h)
            if r.downscaled:
                assert long_in > MM.RESIZE_TARGET
                assert long_out <= MM.RESIZE_TARGET
            else:
                assert (r.out_w, r.out_h) == (r.src_w, r.src_h)
            assert r.out_w >= 1 and r.out_h >= 1
            assert r.n_pixels_out <= r.n_pixels_in
            # integer-rounding aspect bound: |ow*sh - oh*sw| <= long edge
            assert abs(r.out_w * r.src_h - r.out_h * r.src_w) <= long_in

    def test_resize_filters_to_images(self, spark):
        assets = MM.to_assets(docs(spark, [(i, f"p{i}") for i in range(9)]),
                              "doc_id", "text")
        planned = MM.plan_resizes(assets)
        n_images = assets.where(F.col("media_type") == "image").count()
        assert planned.count() == n_images == 3


class TestPiiScrub:
    def test_redaction_is_idempotent_and_counts_match(self, spark):
        from data_etl_scripts_showcase__spark.queries.text_analysis import (
            _EMAIL_RE, _IP_RE, _PHONE_RE,
        )

        d = docs(spark, [(1, "mail a.b+c@ex-1.example.org or +91-800-1234 "
                             "and +1-555-0000 at 10.0.255.3 end")])
        def scrub(col):
            return F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(col, _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE, "<PHONE>"),
                _IP_RE, "<IP>")

        row = d.select(
            scrub(F.col("text")).alias("once"),
            scrub(scrub(F.col("text"))).alias("twice"),
            F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("e"),
            F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).alias("p"),
            F.size(F.regexp_extract_all("text", F.lit(_IP_RE), 0)).alias("i"),
        ).collect()[0]
        assert row.once == row.twice  # placeholders never re-match
        assert (row.e, row.p, row.i) == (1, 2, 1)
        assert "<EMAIL>" in row.once and "<PHONE>" in row.once and "<IP>" in row.once


class TestUdfSurface:
    def test_plain_udf_agrees_with_expression(self, spark):
        """py_bool_to_int (row-at-a-time udf, the documented slow path)
        must agree with the Column-expression form on all inputs."""
        from data_etl_scripts_showcase__spark.functions import bool_to_int
        from data_etl_scripts_showcase__spark.functions.udfs import py_bool_to_int

        d = spark.createDataFrame(
            [(True,), (False,), (None,)], "v boolean"
        ).select(
            py_bool_to_int("v").alias("u"), bool_to_int("v").alias("e")
        )
        assert all(r.u == r.e for r in d.collect())


class TestVideoFrameSample:
    def test_frame_grid_invariants(self, spark):
        """≤8 frames/clip, even spacing, integer PTS, video-only."""
        assets = MM.to_assets(
            docs(spark, [(i, "v" * (5 + i * 97)) for i in range(12)]),
            "doc_id", "text",
        )
        sampled = MM.sample_video_frames(assets)
        rows = sampled.collect()
        assert rows
        n_videos = assets.where(F.col("media_type") == "video").count()
        by_asset: dict[int, list] = {}
        for r in rows:
            by_asset.setdefault(r.asset_id, []).append(r)
        assert len(by_asset) == n_videos
        for frames in by_asset.values():
            assert 1 <= len(frames) <= MM.MAX_SAMPLED_FRAMES
            frames.sort(key=lambda r: r.frame_idx)
            step = max(1, (frames[0].n_frames + 7) // 8)
            for k, r in enumerate(frames):
                assert r.frame_idx == k * step
                assert r.pts_ms == r.frame_idx * 1000 // r.fps
                assert 6 <= r.fps <= 30

    def test_partitioning_independent(self, spark):
        assets = MM.to_assets(
            docs(spark, [(i, f"clip {i} " * (i + 1)) for i in range(9)]),
            "doc_id", "text",
        )
        one = {tuple(r) for r in MM.sample_video_frames(assets, parallelism=1).collect()}
        many = {tuple(r) for r in MM.sample_video_frames(assets, parallelism=8).collect()}
        assert one == many


class TestCountMinSketch:
    def test_merge_of_shard_sketches_equals_whole(self, spark):
        """The 100 TB property: sketching two disjoint shards and merging
        cell-wise equals sketching everything at once."""
        from data_etl_scripts_showcase__spark.operators.sketches import (
            cms_build,
            cms_merge,
        )

        ev = spark.createDataFrame(
            [(i % 7,) for i in range(200)], "k bigint"
        )
        whole = cms_build(ev, "k")
        a = cms_build(ev.where(F.col("k") < 3), "k")
        b = cms_build(ev.where(F.col("k") >= 3), "k")
        merged = cms_merge(a, b)
        as_map = lambda df: {
            (r.row, r.bucket): r.n for r in df.collect()
        }
        assert as_map(merged) == as_map(whole)

    def test_estimates_never_undercount(self, spark):
        from data_etl_scripts_showcase__spark.operators.sketches import (
            cms_build,
            cms_probe,
        )

        ev = spark.createDataFrame([(i % 13,) for i in range(300)], "k bigint")
        sketch = cms_build(ev, "k")
        exact = ev.groupBy("k").count()
        est = cms_probe(sketch, exact.select("k"), "k")
        j = est.join(exact, "k").collect()
        assert len(j) == 13
        assert all(r.est_n >= r["count"] for r in j)


class TestAsofForward:
    def test_forward_semantics_edges(self, spark):
        """Equal timestamps match (>= semantics); matches beyond tolerance
        null out; keys never cross; no-following-row yields nulls."""
        from data_etl_scripts_showcase__spark.operators.asof import (
            asof_join_forward,
        )

        left = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00"),
                (2, 1, "2024-01-01 23:00:00"),
                (3, 2, "2024-01-01 10:00:00"),
            ],
            "event_id bigint, user_id bigint, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        right = spark.createDataFrame(
            [
                (1, "2024-01-01 10:00:00", 5.0),   # equal ts -> matches id 1
                (1, "2024-01-03 23:30:00", 7.0),   # 2d0.5h after id 2 -> beyond 2d
            ],
            "user_id bigint, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

        out = {
            r.event_id: r
            for r in asof_join_forward(
                left, right, on="ts", by=["user_id"], tolerance="2 days"
            ).collect()
        }
        assert out[1].value == 5.0  # >= includes equality
        assert out[2].value is None and out[2].ts_asof is None  # tolerance
        assert out[3].value is None  # other key has no rows at all

    def test_forward_unbounded_picks_nearest(self, spark):
        from data_etl_scripts_showcase__spark.operators.asof import (
            asof_join_forward,
        )

        left = spark.createDataFrame(
            [(1, 1, "2024-01-01 00:00:00")],
            "event_id bigint, user_id bigint, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        right = spark.createDataFrame(
            [(1, "2024-01-05 00:00:00", 2.0), (1, "2024-01-02 00:00:00", 1.0)],
            "user_id bigint, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        row = asof_join_forward(left, right, on="ts", by=["user_id"]).collect()[0]
        assert row.value == 1.0  # nearest following, not any following


class TestLeakageSafeSplit:
    def test_no_verified_pair_straddles_the_split(self, spark):
        """The d15 invariant, pair-by-pair: every verified near-dup pair has
        both members on the same side of the train/val boundary."""
        from data_etl_scripts_showcase__spark.operators.graph import (
            connected_components,
        )
        from data_etl_scripts_showcase__spark.sources import load_table

        SF = "/root/testdata/sf0.001"
        docs = load_table(spark, SF, "documents")
        grams = docs.select("doc_id", TX.tokens("text").alias("_t")).select(
            "doc_id", DD.ngrams_from_tokens(F.col("_t")).alias("grams")
        )
        sig = DD.minhash_signature(docs, "doc_id", "text")
        cand = DD.candidate_pairs(DD.lsh_buckets(sig, "doc_id"), "doc_id")
        ga = grams.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
        gb = grams.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
        verified = (
            cand.join(ga, "id_a").join(gb, "id_b")
            .where(DD.jaccard(F.col("ga"), F.col("gb")) >= 0.5)
            .select("id_a", "id_b")
        )
        assert verified.count() > 0  # invariant is non-vacuous on this data

        comp = connected_components(verified, "id_a", "id_b")
        grouped = docs.join(comp, docs.doc_id == comp.id, "left").select(
            docs.doc_id, F.coalesce("component", docs.doc_id).alias("grp")
        )
        side = F.when(
            F.conv(F.substring(F.md5(F.col("grp").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 10 < 8,
            "train",
        ).otherwise("val")
        split = grouped.select("doc_id", side.alias("split"))
        sa = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
        sb = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
        straddlers = (
            verified.join(sa, "id_a").join(sb, "id_b")
            .where(F.col("split_a") != F.col("split_b"))
        )
        assert straddlers.count() == 0


class TestHllSketch:
    def test_merge_of_shard_registers_equals_whole(self, spark):
        """Registers merge by cell-wise max: shard-then-merge == whole."""
        from data_etl_scripts_showcase__spark.operators.sketches import (
            hll_merge,
            hll_registers,
        )

        df = spark.createDataFrame([(i % 97,) for i in range(400)], "k bigint")
        whole = hll_registers(df, "k")
        a = hll_registers(df.where(F.col("k") < 40), "k")
        b = hll_registers(df.where(F.col("k") >= 40), "k")
        merged = hll_merge(a, b)
        as_map = lambda d: {r.idx: r.reg for r in d.collect()}
        assert as_map(merged) == as_map(whole)

    def test_estimate_accuracy_contract(self, spark):
        """64 registers → ~13% std error; assert a generous 30% bound on a
        few cardinalities (fixed md5 hashing makes this deterministic)."""
        from data_etl_scripts_showcase__spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        for n in (50, 300, 1000):
            df = spark.createDataFrame([(i,) for i in range(n)], "k bigint")
            est = hll_estimate(hll_registers(df, "k")).collect()[0]
            assert abs(est.est_distinct - n) / n < 0.30, (n, est.est_distinct)

    def test_duplicates_do_not_move_estimate(self, spark):
        from data_etl_scripts_showcase__spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        uniq = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
        dup = uniq.unionAll(uniq).unionAll(uniq)
        e1 = hll_estimate(hll_registers(uniq, "k")).collect()[0].est_distinct
        e2 = hll_estimate(hll_registers(dup, "k")).collect()[0].est_distinct
        assert e1 == e2


class TestBloomFilter:
    def test_no_false_negatives(self, spark):
        from data_etl_scripts_showcase__spark.operators.bloom import (
            bloom_bits,
            bloom_probe,
        )

        build = spark.createDataFrame([(i * 3,) for i in range(500)], "k bigint")
        bits = bloom_bits(build, "k")
        probe = bloom_probe(build, bits, "k")
        assert probe.where(~F.col("bloom_pass")).count() == 0

    def test_nonmembers_mostly_rejected(self, spark):
        from data_etl_scripts_showcase__spark.operators.bloom import (
            bloom_bits,
            bloom_probe,
        )

        build = spark.createDataFrame([(i,) for i in range(500)], "k bigint")
        others = spark.createDataFrame(
            [(i,) for i in range(10_000, 11_000)], "k bigint"
        )
        bits = bloom_bits(build, "k")
        probe = bloom_probe(others, bits, "k")
        fp = probe.where(F.col("bloom_pass")).count()
        # k=3, m=8192, n=500 → theoretical fpp ~0.4%; assert < 5%
        assert fp < 50, fp

    def test_filter_size_bounded(self, spark):
        from data_etl_scripts_showcase__spark.operators.bloom import (
            BLOOM_M,
            bloom_bits,
        )

        build = spark.createDataFrame([(i,) for i in range(20_000)], "k bigint")
        assert bloom_bits(build, "k").count() <= BLOOM_M


class TestZorder:
    def test_zvalue_bijection_roundtrip(self, spark):
        """Interleave is a bijection on [0,256)² → [0,65536)."""
        from data_etl_scripts_showcase__spark.operators.zorder import zvalue

        pts = spark.createDataFrame(
            [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)],
            "x bigint, y bigint",
        )
        z = pts.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("zv"))
        rows = z.collect()
        assert len({r.zv for r in rows}) == len(rows)
        for r in rows:
            xx = sum(((r.zv >> (2 * i)) & 1) << i for i in range(8))
            yy = sum(((r.zv >> (2 * i + 1)) & 1) << i for i in range(8))
            assert (xx, yy) == (r.x, r.y)

    def test_zorder_files_bound_both_spans(self, spark):
        """Per-file spans under z-order are bounded in BOTH dims (≤ 16 for
        a 256-file split of a full 256×256 grid), where a y-sorted layout
        leaves x unbounded."""
        from data_etl_scripts_showcase__spark.operators.zorder import zvalue

        pts = spark.createDataFrame(
            [(x, y) for x in range(0, 256, 5) for y in range(0, 256, 5)],
            "x bigint, y bigint",
        )
        z = pts.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("zv"))
        spans = (
            z.groupBy(F.shiftright("zv", 8).alias("f"))
            .agg(
                (F.max("x") - F.min("x")).alias("xs"),
                (F.max("y") - F.min("y")).alias("ys"),
            )
            .agg(F.max("xs").alias("mx"), F.max("ys").alias("my"))
            .collect()[0]
        )
        assert spans.mx <= 16 and spans.my <= 16, spans


class TestTriangles:
    def test_hand_graph(self, spark):
        """K4 minus one edge has exactly 2 triangles; edge direction and
        duplicates don't change the census."""
        from data_etl_scripts_showcase__spark.operators.graph import triangles

        edges = spark.createDataFrame(
            [
                (1, 2), (2, 3), (1, 3),   # triangle 1-2-3
                (2, 4), (3, 4),           # triangle 2-3-4 (via 2-3)
                (2, 1),                   # reversed duplicate
                (5, 6),                   # triangle-free component
            ],
            "src bigint, dst bigint",
        )
        tri = sorted(tuple(r) for r in triangles(edges).collect())
        assert tri == [(1, 2, 3), (2, 3, 4)]

    def test_no_triangles_in_a_path(self, spark):
        from data_etl_scripts_showcase__spark.operators.graph import triangles

        path = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "src bigint, dst bigint"
        )
        assert triangles(path).count() == 0


class TestSnapshotTimeTravel:
    def test_as_of_picks_highest_eligible_version(self, spark, tmp_path):
        import pytest

        from data_etl_scripts_showcase__spark.streaming.jobs import (
            read_snapshot_as_of,
        )

        base = str(tmp_path)
        for v, n in ((0, 1), (1, 2), (5, 3)):
            spark.createDataFrame([(i,) for i in range(n)], "k bigint").write.parquet(
                f"{base}/v{v:09d}"
            )
        assert read_snapshot_as_of(spark, base, 0).count() == 1
        assert read_snapshot_as_of(spark, base, 3).count() == 2  # gap → v1
        assert read_snapshot_as_of(spark, base, 99).count() == 3
        with pytest.raises(ValueError):
            read_snapshot_as_of(spark, base, -1)


class TestBandJoinKeys:
    def test_extra_keys_restrict_pairs(self, spark):
        from data_etl_scripts_showcase__spark.operators.rangejoin import band_join

        l = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 10.0)], "lid bigint, g string, lv double"
        )
        r = spark.createDataFrame(
            [(3, "a", 11.0), (4, "b", 100.0)], "rid bigint, g string, rv double"
        )
        got = {
            (x.lid, x.rid)
            for x in band_join(l, r, "lv", "rv", F.lit(5.0), extra_keys=["g"]).collect()
        }
        # (1,3): same group, in band. (2,3): in band but wrong group. (2,4): group ok, out of band.
        assert got == {(1, 3)}


class TestLabelPropagation:
    def test_barbell_splits_where_cc_merges(self, spark):
        """Two triangles joined by one bridge edge: connected components
        collapses everything to one label; label propagation keeps the two
        dense cores as separate communities."""
        from data_etl_scripts_showcase__spark.operators.graph import (
            connected_components,
            label_propagation,
        )

        edges = spark.createDataFrame(
            [
                (1, 2), (2, 3), (1, 3),   # triangle A
                (4, 5), (5, 6), (4, 6),   # triangle B
                (3, 4),                   # bridge
            ],
            "src bigint, dst bigint",
        )
        cc = {r.component for r in connected_components(edges).collect()}
        assert cc == {1}
        lp = {r.id: r.community for r in label_propagation(edges).collect()}
        assert lp[1] == lp[2] == lp[3]
        assert lp[4] == lp[5] == lp[6]
        assert lp[1] != lp[4]

    def test_deterministic_under_partitioning(self, spark):
        from data_etl_scripts_showcase__spark.operators.graph import (
            label_propagation,
        )

        edges = spark.createDataFrame(
            [(i, (i * 7) % 23) for i in range(40) if i != (i * 7) % 23],
            "src bigint, dst bigint",
        )
        a = sorted(tuple(r) for r in label_propagation(edges.repartition(1)).collect())
        b = sorted(tuple(r) for r in label_propagation(edges.repartition(13)).collect())
        assert a == b


class TestGeoGridWrap:
    def test_antimeridian_pair_is_found(self, spark):
        """179.9E and 179.9W at the same latitude are ~22 km apart on the
        sphere; the modular longitude ring must bring them into the same
        candidate neighborhood (a flat grid would never join them)."""
        from pyspark.sql import functions as F

        pts = spark.createDataFrame(
            [(1, 10.0, 179.9), (2, 10.0, -179.9), (3, 10.0, 0.0)],
            "id bigint, lat double, lon double",
        )
        a = pts.select(
            F.col("id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
        )
        b = pts.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
        )
        cells_a = F.explode(
            F.array(
                *[
                    F.struct(
                        (F.floor(F.col("lat_a")) + di).alias("latc"),
                        F.pmod(
                            F.floor(F.col("lon_a") / 2) + dj, F.lit(180)
                        ).alias("lonc"),
                    )
                    for di in (-1, 0, 1)
                    for dj in (-1, 0, 1)
                ]
            )
        )
        ae = a.select("*", cells_a.alias("c")).select(
            "id_a", "lat_a", "lon_a", "c.latc", "c.lonc"
        )
        be = b.select(
            "*",
            F.floor(F.col("lat_b")).alias("latc"),
            F.pmod(F.floor(F.col("lon_b") / 2), F.lit(180)).alias("lonc"),
        )
        cand = (
            ae.join(be, ["latc", "lonc"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        got = {tuple(r) for r in cand.collect()}
        assert (1, 2) in got        # wrapped neighbors meet
        assert (1, 3) not in got    # far-apart points never pair


class TestCdcIncrementalMerge:
    def test_batched_replay_equals_one_shot(self, spark):
        """x37's associativity claim: replaying the change log in any batch
        slicing, merging each batch's last-wins into running state (with
        delete tombstones RETAINED in state), converges to the one-shot
        replay exactly; tombstones only drop at read time."""
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        rows = [
            (k, seq, op, float(v))
            for seq, (k, op, v) in enumerate(
                [
                    (1, "I", 10), (2, "I", 20), (1, "U", 11), (3, "I", 30),
                    (2, "D", 0), (1, "U", 12), (3, "U", 31), (2, "I", 21),
                    (3, "D", 0), (1, "D", 0), (1, "I", 13),
                ]
            )
        ]
        schema = "key bigint, seq bigint, op string, val double"

        def last_wins(df):
            w = W.partitionBy("key").orderBy(F.col("seq").desc())
            return (
                df.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .drop("rn")
            )

        full = spark.createDataFrame(rows, schema)
        one_shot = last_wins(full).where(F.col("op") != "D")

        for cuts in ([4], [2, 7], [1, 5, 9]):
            bounds = [0, *cuts, len(rows)]
            state = None
            for lo, hi in zip(bounds, bounds[1:]):
                batch = spark.createDataFrame(rows[lo:hi], schema)
                delta = last_wins(batch)
                state = delta if state is None else last_wins(state.unionByName(delta))
            live = state.where(F.col("op") != "D")
            assert sorted(map(tuple, live.collect())) == sorted(
                map(tuple, one_shot.collect())
            ), cuts
        # final state: key 2 live at 21, key 1 re-inserted at 13, key 3 deleted
        assert sorted((r.key, r.val) for r in one_shot.collect()) == [(1, 13.0), (2, 21.0)]


class TestAlternatingCC:
    """connected_components_alternating ≡ connected_components (r2 pr4)."""

    def _both(self, spark, rows):
        from data_etl_scripts_showcase__spark.operators.graph import (
            connected_components,
            connected_components_alternating,
        )

        e = spark.createDataFrame(rows, "src bigint, dst bigint")
        a = {
            (r.id, r.component)
            for r in connected_components(e).collect()
        }
        b = {
            (r.id, r.component)
            for r in connected_components_alternating(e).collect()
        }
        return a, b

    def test_long_chain_matches_label_propagation(self, spark):
        # a 12-node path — the diameter case the alternating form exists
        # for: label propagation needs ~12 rounds, alternating ~log2(12).
        rows = [(i, i + 1) for i in range(1, 12)] + [(20, 21), (30, 30)]
        a, b = self._both(spark, rows)
        assert a == b
        assert {c for _, c in a} == {1, 20, 30} - {30} | {30}

    def test_star_and_cycle(self, spark):
        rows = [(1, k) for k in (2, 3, 4, 5)] + [(10, 11), (11, 12), (12, 10)]
        a, b = self._both(spark, rows)
        assert a == b
        comps = {}
        for node, c in b:
            comps.setdefault(c, set()).add(node)
        assert comps == {1: {1, 2, 3, 4, 5}, 10: {10, 11, 12}}

    def test_reversed_and_duplicate_edges(self, spark):
        a, b = self._both(spark, [(2, 1), (1, 2), (2, 3), (3, 2), (5, 4)])
        assert a == b == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


class TestGlobalRowIds:
    def test_matches_global_window_and_partitioning_independent(self, spark):
        from data_etl_scripts_showcase__spark.queries.scale_ops2 import (
            global_row_ids,
        )

        rows = [(k, f"2024-{1 + k % 3:02d}-{1 + k % 27:02d}") for k in range(200)]
        df = spark.createDataFrame(rows, "k bigint, d string").select(
            "k", F.col("d").cast("date").alias("d")
        )
        expected = {
            (r.k, r.rid)
            for r in df.selectExpr(
                "k", "row_number() over (order by d, k) - 1 as rid"
            ).collect()
        }
        for nparts in (1, 7):
            got = global_row_ids(
                df.repartition(nparts),
                F.date_format("d", "yyyy-MM"),
                ["d", "k"],
            )
            assert {(r.k, r.row_id) for r in got.collect()} == expected

    def test_ids_are_contiguous(self, spark):
        from data_etl_scripts_showcase__spark.queries.scale_ops2 import (
            global_row_ids,
        )

        df = spark.createDataFrame(
            [(i, i % 5) for i in range(50)], "k bigint, b bigint"
        )
        ids = sorted(
            r.row_id
            for r in global_row_ids(df, F.col("b"), ["b", "k"]).collect()
        )
        assert ids == list(range(50))


class TestPhashBanding:
    def test_pigeonhole_recall_is_exact(self, spark):
        """Every pair with hamming ≤ 3 shares ≥1 of 4 byte-bands, so the
        banded join must find exactly the brute-force pair set."""
        from data_etl_scripts_showcase__spark.operators.multimodal import (
            hamming_band_pairs,
        )

        rows = [
            (1, 0x11223344),
            (2, 0x11223345),   # ham 1 vs id1
            (3, 0x11223377),   # ham vs id1: 0x44^0x77=0x33 -> 4 bits (excluded)
            (4, 0x91223344),   # ham 1 vs id1 (high byte)
            (5, 0x0F0F0F0F),   # far from everything
        ]
        df = spark.createDataFrame(rows, "asset_id bigint, phash bigint")
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in hamming_band_pairs(df).collect()
        }
        import itertools

        brute = set()
        for (ia, pa), (ib, pb) in itertools.combinations(rows, 2):
            h = bin(pa ^ pb).count("1")
            if h <= 3:
                brute.add((min(ia, ib), max(ia, ib), h))
        assert got == brute
        assert (1, 2, 1) in got and (1, 4, 1) in got

    def test_phash_similar_payloads_close(self, spark):
        from data_etl_scripts_showcase__spark.operators.multimodal import (
            phash32_stub,
        )
        from pyspark.sql import functions as F

        base = "the quick brown fox jumps over the lazy dog " * 8
        rows = [
            (1, base),
            (2, base + " tail-edit"),    # near-dup payload
            (3, "completely different payload content entirely " * 8),
        ]
        df = spark.createDataFrame(rows, "asset_id bigint, text string").select(
            "asset_id", F.encode("text", "UTF-8").alias("content")
        )
        ph = {r.asset_id: r.phash for r in phash32_stub(df).collect()}
        near = bin(ph[1] ^ ph[2]).count("1")
        far = bin(ph[1] ^ ph[3]).count("1")
        assert near < far
        assert near <= 6


class TestKthSmallest:
    def test_matches_sorted_ranks(self, spark):
        from data_etl_scripts_showcase__spark.operators.selection import (
            kth_smallest,
        )

        vals = [((i * 37) % 101) * 1.5 - 20.0 for i in range(101)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        sv = sorted(vals)
        for k in (1, 2, 50, 51, 100, 101):
            assert kth_smallest(df, "x", k) == sv[k - 1]

    def test_duplicates_and_single_value(self, spark):
        from data_etl_scripts_showcase__spark.operators.selection import (
            kth_smallest,
        )

        df = spark.createDataFrame([(5.0,)] * 9 + [(1.0,)], "x double")
        assert kth_smallest(df, "x", 1) == 1.0
        assert kth_smallest(df, "x", 2) == 5.0
        assert kth_smallest(df, "x", 10) == 5.0

    def test_float_boundary_values_never_dropped(self, spark):
        """Round-2 advice: narrowing by RECOMPUTED float edges (lo+b*width)
        can drop a counted value an ulp outside the edge.  The fix narrows
        with the identical binning expression, so values lying exactly on
        (or an ulp around) bin boundaries keep their exact ranks."""
        import math

        from data_etl_scripts_showcase__spark.operators.selection import (
            NBINS,
            kth_smallest,
        )

        lo, hi = 0.1, 0.1 + 128 * 0.30000000000000004
        width = (hi - lo) / NBINS
        # values planted exactly at and an ulp around every 8th bin edge
        vals = []
        for b in range(0, NBINS, 8):
            edge = lo + b * width
            vals += [edge, math.nextafter(edge, -math.inf),
                     math.nextafter(edge, math.inf)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        sv = sorted(vals)
        for k in (1, 7, len(vals) // 2, len(vals)):
            assert kth_smallest(df, "x", k) == sv[k - 1], k

    def test_tiny_nonzero_range_terminates(self, spark):
        """width underflow guard: a range a few ulps wide must not loop or
        divide by zero — it stops narrowing and ranks the survivors."""
        import math

        from data_etl_scripts_showcase__spark.operators.selection import (
            kth_smallest,
        )

        base = 1.0
        vals = [base, math.nextafter(base, math.inf),
                math.nextafter(math.nextafter(base, math.inf), math.inf)]
        df = spark.createDataFrame([(v,) for v in vals * 3], "x double")
        sv = sorted(vals * 3)
        for k in (1, 5, 9):
            assert kth_smallest(df, "x", k, rounds=4) == sv[k - 1], k


class TestContentDefinedChunking:
    def test_boundaries_stable_under_insertion(self, spark):
        """CDC's defining property: inserting bytes near the front changes
        only the chunks around the edit — the tail chunk set (by content
        hash) is preserved, unlike fixed-offset windows."""
        from data_etl_scripts_showcase__spark.queries import load_all
        import pyspark.sql.functions as F
        import tempfile, os
        import pyarrow as pa, pyarrow.parquet as pq

        base = "".join(
            f"word{(i * 37) % 211} " for i in range(400)
        )
        edited = base[:50] + "INSERTED-BYTES " + base[50:]
        d = tempfile.mkdtemp()
        # minimal documents table with the two variants
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([base, edited]),
                    "lang": pa.array(["en", "en"]),
                    "source": pa.array(["a", "a"]),
                    "n_chars": pa.array([len(base), len(edited)], pa.int64()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = load_all()["t25_content_defined_chunks"].fn(spark, d)
        chunks = {
            1: {r.chunk_md5 for r in out.where(F.col("doc_id") == 1).collect()},
            2: {r.chunk_md5 for r in out.where(F.col("doc_id") == 2).collect()},
        }
        shared = chunks[1] & chunks[2]
        # most chunks survive the edit verbatim
        assert len(shared) >= max(1, int(0.6 * len(chunks[1])))
        # and the edited doc has at least one chunk the original lacks
        assert chunks[2] - chunks[1]


class TestD22PairBudget:
    """d22's exact-Jaccard audit side must be bounded by a constant pair
    BUDGET, not a fixed sampling rate (round-2 perf-weak item): the
    modulus derives from the corpus count so the sampled-doc count —
    hence the quadratic pair population — stays ~AUDIT_DOC_BUDGET at any
    SF instead of growing linearly (pairs quadratically) with data."""

    def test_sampled_docs_bounded_across_sfs(self, spark):
        from data_etl_scripts_showcase__spark.queries.dedup import AUDIT_DOC_BUDGET
        from data_etl_scripts_showcase__spark.queries import load_all

        q = load_all()["d22_lsh_scurve_audit"]
        for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
            out = q.fn(spark, sf_dir)
            rows = out.collect()
            assert rows, sf_dir
            m = rows[0]["sample_modulus"]
            n_docs = (
                spark.read.parquet(f"{sf_dir}/documents.parquet").count()
            )
            assert m == max(1, -(-n_docs // AUDIT_DOC_BUDGET)), sf_dir
            # sampled side = docs with doc_id % m == 0 ≈ n_docs/m ≤ ~budget;
            # total audited pairs ≤ ~budget²/2 regardless of corpus size.
            sampled = n_docs // m + 1
            assert sampled <= AUDIT_DOC_BUDGET + 1, sf_dir
            total_pairs = sum(r["n_pairs"] for r in rows)
            assert total_pairs <= sampled * (sampled - 1) // 2, sf_dir


class TestNtileClosedForm:
    """x44's closed-form decile rule must reproduce ntile(10) BIT-FOR-BIT
    on counts that are NOT multiples of 10 (ntile front-loads the
    remainder: first n%k buckets get the extra row — the even-spread
    (rank*k) div n formula diverges there)."""

    def test_matches_ntile_on_awkward_counts(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        for n in (7, 12, 101, 1000, 1003):
            df = spark.range(n).select(
                F.col("id"), (F.col("id") * 37 % 1009).alias("v")
            )
            w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
            expected = df.select(
                "id", F.ntile(10).over(w).alias("b")
            )
            ranked = df.select(
                "id", (F.row_number().over(w) - 1).alias("row_id")
            ).withColumn("_n", F.lit(n))
            got = ranked.select(
                "id",
                (
                    F.expr(
                        """CAST(CASE
                             WHEN row_id < (_n % 10) * (_n DIV 10 + 1)
                             THEN row_id DIV (_n DIV 10 + 1)
                             ELSE (_n % 10) + (row_id - (_n % 10) * (_n DIV 10 + 1)) DIV (_n DIV 10)
                           END AS INT)"""
                    )
                    + 1
                ).alias("b"),
            )
            diffs = (
                got.alias("g")
                .join(expected.alias("e"), "id")
                .where(F.col("g.b") != F.col("e.b"))
                .count()
            )
            assert diffs == 0, f"n={n}"


class TestColumnProfile:
    def test_profiles_every_type_in_one_pass(self, spark):
        """The generic profiler handles numeric/string/date/array columns,
        counts nulls, and its manifest matches hand-computed stats."""
        import pyspark.sql.functions as F

        from data_etl_scripts_showcase__spark.operators.profile import (
            column_profile,
        )

        df = spark.createDataFrame(
            [
                (1, "a", 1.5, ["x", "y"]),
                (2, None, 2.5, ["x"]),
                (3, "b", None, []),
                (3, "a", 4.0, None),
            ],
            "id bigint, s string, d double, arr array<string>",
        )
        prof = {r["col"]: r.asDict() for r in column_profile(df).collect()}
        assert prof["id"]["n_distinct"] == 3 and prof["id"]["n_null"] == 0
        assert prof["s"]["n_null"] == 1 and prof["s"]["min_val"] == "a"
        assert prof["d"]["n_null"] == 1 and prof["d"]["max_val"] == "4.0"
        # arrays profile by size: min size 0, max size 2
        assert prof["arr"]["min_val"] == "0" and prof["arr"]["max_val"] == "2"
        assert all(r["n_rows"] == 4 for r in prof.values())


class TestAdviceR3Fixes:
    """Regression pins for the round-3 ADVICE items."""

    def test_kth_smallest_ignores_nulls(self, spark):
        """NULLs must not shift the k-th rank on the rounds=0 or
        width-underflow paths (k is validated against the non-null
        count; row_number over _x ASC would otherwise sort NULLs
        first)."""
        from data_etl_scripts_showcase__spark.operators.selection import (
            kth_smallest,
        )

        vals = [3.0, None, 1.0, None, 2.0, None]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        for rounds in (0, 2):
            assert kth_smallest(df, "x", 1, rounds=rounds) == 1.0
            assert kth_smallest(df, "x", 2, rounds=rounds) == 2.0
            assert kth_smallest(df, "x", 3, rounds=rounds) == 3.0

    def test_running_sums_null_bucket_is_hard_error(self, spark):
        """A NULL bucket key would silently vanish from the offsets join
        while still being counted by callers aggregating the un-joined
        input — it must raise, not diverge."""
        import pytest
        from pyspark.sql import functions as F

        from data_etl_scripts_showcase__spark.operators.prefix import (
            bucketed_running_sums,
        )

        df = spark.createDataFrame(
            [(None, 1), ("b", 2)], "k string, v bigint"
        )
        out = bucketed_running_sums(df, F.col("k"), ["v"], {"v": "rs"})
        with pytest.raises(Exception, match="bucket_col"):
            out.collect()

    def test_bfs_hops_zero_iterations_warns_not_nameerror(self, spark):
        """max_iter=0 must exit through the convergence warning (like
        connected_components), never a NameError on `changed`."""
        import pytest

        from data_etl_scripts_showcase__spark.operators.graph import bfs_hops

        edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
        sources = spark.createDataFrame([(1,)], "id bigint")
        with pytest.warns(RuntimeWarning, match="bfs_hops"):
            got = bfs_hops(edges, sources, max_iter=0)
            assert got.count() == 1  # sources only, no expansion ran

    def test_column_profile_exotic_column_names(self, spark):
        """Names with spaces, dots, quotes, and backticks must profile
        correctly (CLI-exposed on ANY table): positional sanitization
        inside, escaped literal out."""
        from data_etl_scripts_showcase__spark.operators.profile import (
            column_profile,
        )

        data = [(1, 2.0, "x"), (2, None, "y")]
        names = ["a b", "c.d", "it's`q"]
        df = spark.createDataFrame(data, "x1 bigint, x2 double, x3 string")
        for old, new in zip(["x1", "x2", "x3"], names):
            df = df.withColumnRenamed(old, new)
        prof = {r["col"]: r.asDict() for r in column_profile(df).collect()}
        assert set(prof) == set(names)
        assert prof["a b"]["n_distinct"] == 2
        assert prof["c.d"]["n_null"] == 1
        assert prof["it's`q"]["min_val"] == "x"

    def test_attribution_operator_importable_shape(self, spark):
        """linear_attribution keeps per-touch rows with conserved credit
        (full invariant property-tested in test_properties)."""
        from pyspark.sql import functions as F

        from data_etl_scripts_showcase__spark.operators.attribution import (
            linear_attribution,
        )

        clicks = spark.createDataFrame(
            [(1, 7, 100), (2, 7, 200)], "event_id bigint, user_id bigint, sec bigint"
        ).select("event_id", "user_id", F.timestamp_seconds("sec").alias("ts"))
        purchases = spark.createDataFrame(
            [(10, 7, 300, 101)],
            "p_id bigint, p_uid bigint, p_sec bigint, value_cents bigint",
        ).select(
            "p_id", "p_uid", F.timestamp_seconds("p_sec").alias("p_ts"), "value_cents"
        )
        rows = linear_attribution(clicks, purchases).collect()
        got = {r.event_id: r.credit_mc for r in rows}
        # 101000 mc / 2 = 50500 each, remainder 0; earliest is event 1
        assert got == {1: 50500, 2: 50500}
        assert sum(got.values()) == 101 * 1000


class TestSeededEpochShuffle:
    """x57's contract: positions are a per-shard bijection 1..n, stable
    across runs (resumable training order), and the two epoch seeds give
    genuinely different permutations (decorrelated epochs)."""

    def test_positions_bijective_deterministic_decorrelated(self, spark):
        from data_etl_scripts_showcase__spark.queries import load_all

        q = load_all()["x57_seeded_epoch_shuffle"].fn
        sf = "/root/testdata/sf0.001"
        rows = q(spark, sf).collect()
        again = q(spark, sf).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        assert len(by_shard) > 1  # data actually spreads across shards
        diff_any = False
        for shard, rs in by_shard.items():
            n = len(rs)
            assert sorted(r.pos_epoch1 for r in rs) == list(range(1, n + 1))
            assert sorted(r.pos_epoch2 for r in rs) == list(range(1, n + 1))
            order1 = [r.doc_id for r in sorted(rs, key=lambda r: r.pos_epoch1)]
            order2 = [r.doc_id for r in sorted(rs, key=lambda r: r.pos_epoch2)]
            if order1 != order2:
                diff_any = True
        # with ~60 docs/shard the chance two seeded orders coincide is ~1/60!
        assert diff_any, "epoch seeds produced identical shard orders"


class TestGeoGridCover:
    """x35's 1°×2° grid cover must be COMPLETE for the 50 km radius at
    |lat| ≤ 60 (antimeridian wrap included): every in-radius pair meets in
    the a-side's 3×3 neighbor cells.  This is the independence argument
    for x35's grid-blocked DuckDB oracle (VERDICT r5 #1): the oracle
    shares only the cell COVER with the engine, and this test pins the
    cover against brute-force haversine with no grid at all."""

    @staticmethod
    def _hav_km(lat1, lon1, lat2, lon2):
        import math

        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dlat = math.radians(lat2 - lat1)
        dlon = math.radians(lon2 - lon1)
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(rl1) * math.cos(rl2) * math.sin(dlon / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    @staticmethod
    def _cell(lat, lon):
        import math

        return math.floor(lat), math.floor(lon / 2) % 180

    def test_cover_complete_for_50km(self):
        """Adversarial point pairs within 50 km: random, cell-boundary-
        straddling, antimeridian-adjacent, at the ±60° latitude cap.
        For each, b's exact cell must be one of a's 9 neighbor cells."""
        import math
        import random

        rng = random.Random(42)
        pairs = []
        # random in-radius pairs across the domain
        for _ in range(3000):
            lat = rng.uniform(-60, 60)
            lon = rng.uniform(-180, 180)
            # displace by < 50 km in a random direction
            d_km = rng.uniform(0, 49.9)
            brg = rng.uniform(0, 2 * math.pi)
            dlat = (d_km / 111.19) * math.cos(brg)
            dlon = (d_km / (111.19 * max(math.cos(math.radians(lat)), 0.4))) * math.sin(brg)
            lat2 = max(-60.0, min(60.0, lat + dlat))
            lon2 = ((lon + dlon) + 180.0) % 360.0 - 180.0
            pairs.append((lat, lon, lat2, lon2))
        # antimeridian neighbors and boundary-tangent cases
        for lat in (-60.0, -59.999, 0.0, 33.3333, 59.999, 60.0):
            pairs.append((lat, 179.95, lat, -179.95))
            pairs.append((lat, -179.999, lat, 179.999))
            pairs.append((lat, 1.9999, lat, 2.0001))
        missed = []
        for lat1, lon1, lat2, lon2 in pairs:
            if self._hav_km(lat1, lon1, lat2, lon2) > 50.0:
                continue
            la, lo = self._cell(lat1, lon1)
            lb, lob = self._cell(lat2, lon2)
            if not (
                lb in (la - 1, la, la + 1)
                and lob in ((lo - 1) % 180, lo, (lo + 1) % 180)
            ):
                missed.append((lat1, lon1, lat2, lon2))
        assert not missed, missed[:5]

    def test_blocked_join_equals_naive_quadratic(self, spark):
        """x35's engine output equals the NAIVE all-pairs haversine join
        (run in DuckDB at sf0.001, 1500 points ≈ 1.1M pairs) — value-level
        proof that grid blocking drops nothing, independent of the
        grid-blocked production oracle."""
        import duckdb

        from data_etl_scripts_showcase__spark.queries import load_all
        from data_etl_scripts_showcase__spark.queries.scale_ops import (
            _GEO_PT,
            _HAV,
        )

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'"
        )
        naive = con.execute(
            f"""
            WITH pts AS ({_GEO_PT})
            SELECT a.id AS id_a, b.id AS id_b, round({_HAV}, 3) AS dist_km
            FROM pts a JOIN pts b ON a.id < b.id
            WHERE round({_HAV}, 3) <= 50.0
            ORDER BY id_a, id_b
            """
        ).fetchall()
        got = sorted(
            (r.id_a, r.id_b, r.dist_km)
            for r in load_all()["x35_geo_radius_join"].fn(spark, sf).collect()
        )
        assert len(got) == len(naive)
        for g, n in zip(got, naive):
            assert g[0] == n[0] and g[1] == n[1], (g, n)
            assert abs(g[2] - n[2]) < 1e-6, (g, n)


class TestBandJoinIntegralExact:
    """band_join's exact integral path (ADVICE r5): with bigint values and
    a literal int eps, bucketing routes through _floor_div_exact — exact
    over the full int64 domain, where the double quotient near 2^62 can
    land more than one bucket off and silently drop in-band matches."""

    def test_matches_brute_force_at_int64_edge(self, spark):
        from data_etl_scripts_showcase__spark.operators.rangejoin import band_join

        eps = 1000
        base = 2**62
        lvals = [base, base + eps, base + eps + 1, base + 3 * eps,
                 -base, -base - eps, 0, 2**63 - 2 * eps]
        rvals = [base + eps, base + 2 * eps + 1, -base + eps - 1,
                 -base - 2 * eps, eps, 2**63 - eps - 1]
        l = spark.createDataFrame([(i, v) for i, v in enumerate(lvals)], "lid int, lv long")
        r = spark.createDataFrame([(i, v) for i, v in enumerate(rvals)], "rid int, rv long")
        got = sorted(
            (x.lid, x.rid)
            for x in band_join(l, r, "lv", "rv", eps).collect()
        )
        want = sorted(
            (i, j)
            for i, lv in enumerate(lvals)
            for j, rv in enumerate(rvals)
            if abs(lv - rv) <= eps
        )
        assert got == want

    def test_float_eps_column_path_still_works(self, spark):
        from data_etl_scripts_showcase__spark.operators.rangejoin import band_join

        l = spark.createDataFrame([(1, 10.0), (2, 25.5)], "lid int, lv double")
        r = spark.createDataFrame([(1, 12.0), (2, 31.0)], "rid int, rv double")
        got = sorted(
            (x.lid, x.rid)
            for x in band_join(l, r, "lv", "rv", F.lit(5.5)).collect()
        )
        assert got == [(1, 1), (2, 2)]


class TestCappedContamination:
    """d25 (VERDICT r6 #3): the capped contamination report's output is
    bounded by k·|bench| and its exact totals lose nothing vs uncapped
    d23 — the cap trims EVIDENCE rows, never accounting."""

    SF = "/root/testdata/sf0.001"

    def test_output_bounded_and_totals_exact(self, spark):
        from data_etl_scripts_showcase__spark.queries import load_all

        registry = load_all()
        capped = registry["d25_chunk_contamination_capped"].fn(
            spark, self.SF
        ).toPandas()
        full = registry["d23_chunk_contamination"].fn(spark, self.SF).toPandas()

        k = 5
        assert len(capped) <= k * capped["bench_doc_id"].nunique()
        assert (capped["rank_k"] <= k).all()
        # the retained rows are each bench doc's worst offenders
        worst = (
            full.sort_values(
                ["bench_doc_id", "contamination", "corpus_doc_id"],
                ascending=[True, False, True],
            )
            .groupby("bench_doc_id")
            .head(k)
        )
        got = set(zip(capped["bench_doc_id"], capped["corpus_doc_id"]))
        want = set(zip(worst["bench_doc_id"], worst["corpus_doc_id"]))
        assert got == want
        # exact totals survive the cap
        tot = full.groupby("bench_doc_id").agg(
            n=("corpus_doc_id", "count"), s=("shared_chars", "sum")
        )
        for b, grp in capped.groupby("bench_doc_id"):
            assert set(grp["n_offending_docs"]) == {tot.loc[b, "n"]}
            assert set(grp["total_shared_chars"]) == {tot.loc[b, "s"]}
