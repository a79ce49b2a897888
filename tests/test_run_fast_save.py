"""Checkpoint-save schedule of the fast drivers (regression for the exp2
final-save skip: n_iters=1041 not divisible by iters_per_epoch=10 meant the
`it+1 == n_iters` condition never fired at an epoch boundary)."""

from run_fast import should_save


def epoch_boundaries(n_iters, iters_per_epoch):
    for it in range(n_iters):
        if (it + 1) % iters_per_epoch == 0:
            yield it, (it + 1) // iters_per_epoch


def saved_epochs(n_iters, iters_per_epoch, save_freq):
    return [ep for it, ep in epoch_boundaries(n_iters, iters_per_epoch)
            if should_save(ep, it, iters_per_epoch, n_iters, save_freq)]


def test_exp2_shape_saves_final_epoch():
    # exp2: 2e6 steps / (40 worlds * 48 T) = 1041 iters, 20000//1920 = 10/epoch
    eps = saved_epochs(n_iters=1041, iters_per_epoch=10, save_freq=10)
    assert eps[-1] == 104  # the last epoch boundary (it=1039), NOT skipped
    assert all(e % 10 == 0 for e in eps[:-1])


def test_divisible_shape_unchanged():
    # exp3: 3e6 / 2000 = 1500 iters, 15/epoch -> 100 epochs; final == multiple
    eps = saved_epochs(n_iters=1500, iters_per_epoch=15, save_freq=10)
    assert eps == [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_tiny_run_always_saves_last():
    # epochs*steps_per_epoch smaller than one iter still saves once
    eps = saved_epochs(n_iters=1, iters_per_epoch=1, save_freq=10)
    assert eps == [1]
