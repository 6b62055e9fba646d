Feature: Multi-label matching matrix

  Scenario: conjunctive label match requires all labels
    Given an empty graph
    And having executed:
      """
      CREATE (:A1:B1 {id: 1}), (:A1 {id: 2}), (:B1 {id: 3})
      """
    When executing query:
      """
      MATCH (n:A1:B1) RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: single-label match finds multi-labeled nodes too
    Given an empty graph
    And having executed:
      """
      CREATE (:A2:B2 {id: 1}), (:A2 {id: 2})
      """
    When executing query:
      """
      MATCH (n:A2) RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: label predicate in WHERE over an untyped scan
    Given an empty graph
    And having executed:
      """
      CREATE (:LA {id: 1}), (:LB {id: 2})
      """
    When executing query:
      """
      MATCH (n) WHERE n:LA RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: label predicate in RETURN projects booleans
    Given an empty graph
    And having executed:
      """
      CREATE (:LC:LD {id: 1}), (:LC {id: 2})
      """
    When executing query:
      """
      MATCH (n:LC) RETURN n.id AS id, n:LD AS isld ORDER BY id
      """
    Then the result should be, in order:
      | id | isld  |
      | 1  | true  |
      | 2  | false |

  Scenario: added label participates in later conjunctive matches
    Given an empty graph
    And having executed:
      """
      CREATE (:LE {id: 1}), (:LE {id: 2})
      """
    And having executed:
      """
      MATCH (n:LE {id: 1}) SET n:Extra
      """
    When executing query:
      """
      MATCH (n:LE:Extra) RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 1  |

  Scenario: removed label excludes from conjunctive matches
    Given an empty graph
    And having executed:
      """
      CREATE (:LF:Gone {id: 1}), (:LF:Gone {id: 2})
      """
    And having executed:
      """
      MATCH (n:LF {id: 1}) REMOVE n:Gone
      """
    When executing query:
      """
      MATCH (n:LF:Gone) RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: labels function lists every label after mutations
    Given an empty graph
    And having executed:
      """
      CREATE (:One {id: 1})
      """
    And having executed:
      """
      MATCH (n:One) SET n:Two SET n:Three
      """
    When executing query:
      """
      MATCH (n:One)
      RETURN size(labels(n)) AS n_labels
      """
    Then the result should be, in any order:
      | n_labels |
      | 3        |

  Scenario: match on either of two labels via WHERE OR
    Given an empty graph
    And having executed:
      """
      CREATE (:LX {id: 1}), (:LY {id: 2}), (:LZ {id: 3})
      """
    When executing query:
      """
      MATCH (n) WHERE n:LX OR n:LY RETURN n.id AS id ORDER BY id
      """
    Then the result should be, in order:
      | id |
      | 1  |
      | 2  |

  Scenario: negated label predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:LN:Tag {id: 1}), (:LN {id: 2})
      """
    When executing query:
      """
      MATCH (n:LN) WHERE NOT n:Tag RETURN n.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 2  |

  Scenario: endpoint labels constrain relationship matches
    Given an empty graph
    And having executed:
      """
      CREATE (:S1:Hub {id: 1})-[:L]->(:T1 {id: 10})
      """
    And having executed:
      """
      CREATE (:S1 {id: 2})-[:L]->(:T1 {id: 20})
      """
    When executing query:
      """
      MATCH (:S1:Hub)-[:L]->(t:T1) RETURN t.id AS id
      """
    Then the result should be, in any order:
      | id |
      | 10 |

  Scenario: label scan count matches full membership
    Given an empty graph
    And having executed:
      """
      CREATE (:CM:Extra1), (:CM), (:Other)
      """
    When executing query:
      """
      MATCH (n:CM) RETURN count(n) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: db.labels lists every live label
    Given an empty graph
    And having executed:
      """
      CREATE (:Alpha), (:Beta:Gamma)
      """
    When executing query:
      """
      CALL db.labels() YIELD label
      RETURN label ORDER BY label
      """
    Then the result should be, in order:
      | label   |
      | 'Alpha' |
      | 'Beta'  |
      | 'Gamma' |
