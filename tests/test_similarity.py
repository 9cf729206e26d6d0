

def test_quantize_int8_hand_computed(spark):
    from flink_training_exercises_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),          # ||v||=5e6 scaled; q = [76, 101]
            (2, [0.0, 0.0]),          # zero-norm guard -> zeros
            (3, [-1.0, 0.0]),         # q = [-127, 0]
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # v1 ints = [3e6, 4e6]; norm2 = 25e12; sqrt = 5e6
    # q = floor(127*3e6/5e6), floor(127*4e6/5e6) = floor(76.2), floor(101.6)
    assert out[1]["norm2"] == 25_000_000_000_000
    assert (out[1]["q_sum"], out[1]["q_l1"]) == (76 + 101, 76 + 101)
    assert (out[1]["q_min"], out[1]["q_max"]) == (76, 101)
    assert (out[2]["q_sum"], out[2]["q_l1"], out[2]["norm2"]) == (0, 0, 0)
    assert (out[3]["q_min"], out[3]["q_max"]) == (-127, 0)
    assert out[3]["q_l1"] == 127
