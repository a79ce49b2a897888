"""Learning algorithms: recurrent Q-learning (DRQN single-agent, MADRQN
multi-agent with optional double-Q, dueling, and QMIX mixing)."""
