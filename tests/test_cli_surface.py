"""CLI-contract details: historical flags, num_heads validation, strict
validation cadence arithmetic."""

import pytest

from prtp_tpu.options import get_options
from prtp_tpu.train import next_val_trigger


def test_historical_reference_flags_accepted():
    # commented-out in the reference (src/options.py:31,37-38) but part
    # of its historical surface; must parse as no-ops
    opts = get_options(["--balanced", "--data_info_txt", "info.txt",
                        "--data_usage", "train"])
    assert opts.balanced is True
    assert opts.data_info_txt == "info.txt"
    assert opts.data_usage == "train"


def test_num_heads_must_divide_out_dim():
    from prtp_tpu.models.fusion import model_from_options

    with pytest.raises(ValueError, match="num_heads"):
        model_from_options(get_options(["--attn", "--num_heads", "3"]))
    m = model_from_options(get_options(["--attn", "--num_heads", "4"]))
    assert m.num_heads == 4 and m.flag_attn


def test_next_val_trigger_matches_reference_cadence():
    # reference: validate when bidx % 50 == 0 or bidx == num_batch - 1
    num_batch, vi = 137, 50
    ref_triggers = [b for b in range(num_batch)
                    if b % vi == 0 or b == num_batch - 1]
    # walking chunks with spd=8 must stop exactly on each trigger
    hit = []
    bidx, spd = 0, 8
    while bidx < num_batch:
        take = min(spd, next_val_trigger(bidx, num_batch, vi) - bidx + 1)
        end = bidx + take - 1
        if end % vi == 0 or end == num_batch - 1:
            hit.append(end)
        bidx = end + 1
    assert hit == ref_triggers


def test_next_val_trigger_edges():
    assert next_val_trigger(0, 100, 50) == 0     # batch 0 triggers
    assert next_val_trigger(1, 100, 50) == 50
    assert next_val_trigger(51, 100, 50) == 99   # design end
    assert next_val_trigger(99, 100, 50) == 99
    assert next_val_trigger(0, 1, 50) == 0
