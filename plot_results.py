"""Plot experiment results stored in a data directory
(parity: reference ``plot_results.py``)."""

import os

logdir = './data/exp3_8ubs'

xaxis = 'Epoch'
# xaxis = 'Time'
# xaxis = 'TotalEnvInteracts'

value = 'AverageEpRet'
# value = 'FairIdx'
# value = 'TotalThroughput'
# value = 'AverageTestEpRet'
# value = 'LossQ'

plot_cmd = f'python -m uav_bs_ctrl_tpu.utils.plot {logdir} --xaxis={xaxis} --value={value}'
os.system(plot_cmd)
