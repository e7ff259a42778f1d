package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** One declared operator: (session, sf-dir) → sorted, normalized DataFrame. */
  type Q = (SparkSession, String) => DataFrame
}
