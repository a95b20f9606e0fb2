"""(stub — filled in by later milestones)"""
